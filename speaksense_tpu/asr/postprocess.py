"""Transcript post-processing: promotional-text filtering, CJK punctuation.

Behavior mirror of /root/reference/src/asr/whisper.rs:
- `is_promotional_text` (:41-43): drop segments containing known
  video-platform promo phrases (Whisper hallucinates these on
  silence/music because they dominate subtitle training data).
- `add_punctuation` (:175-201): heuristic sentence-final punctuation for
  Chinese segments based on question/exclamation cue characters.
"""

from __future__ import annotations

# Same phrase set the reference filters (whisper.rs:9-14) — this is behavior
# data, not code: the phrases are the Chinese "like/subscribe/donate" subtitle
# hallucinations whisper emits on non-speech audio.
PROMOTIONAL_PHRASES: tuple[str, ...] = (
    "请不吝点赞", "請不吝點贊", "點贊", "訂閱", "订阅", "打赏", "打賞",
    "打賞支持明鏡與點點欄目", "打赏支持明镜与点点栏目",
    "並且按下小鈴鐺才能收到最新消息哦!", "請按讚、訂閱、分享!",
    "明镜需要您的支持 欢迎收看订阅明镜",
    "請按讚,訂閱,分享,打開小鈴鐺,並且按下小鈴鐺才能收到最新消息謝謝觀看",
    "請按讚,訂閱,分享,打開小鈴鐺,並且按下小鈴鐺才能收到最新消息哦!",
)

_QUESTION_CUES = ("吗", "呢", "什么", "为何", "怎么")
_EXCLAIM_CUES = ("啊", "哇", "太", "真", "好", "真是")
_SENTENCE_FINAL = ("。", "！", "？", "，")


def is_promotional_text(text: str, phrases: tuple[str, ...] = PROMOTIONAL_PHRASES) -> bool:
    return any(p in text for p in phrases)


def add_punctuation(text: str) -> str:
    """Append '？'/'！'/' ' by cue characters unless already punctuated
    (reference whisper.rs:175-201, applied per segment)."""
    if text.endswith(_SENTENCE_FINAL):
        return text
    if any(c in text for c in _QUESTION_CUES):
        return text + "？"
    if any(c in text for c in _EXCLAIM_CUES):
        return text + "！"
    return text + " "


def compression_ratio(text: str) -> float:
    """zlib compressibility — whisper's repetition detector (whisper.cpp's
    entropy_thold ~ 2.4 maps to this fallback criterion)."""
    import zlib

    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))
