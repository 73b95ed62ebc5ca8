"""Special-token layout and text codec tests."""

import numpy as np

from speaksense_tpu.models.tokenizer import Tokenizer, LANGUAGES


def test_multilingual_v2_layout():
    tok = Tokenizer.synthetic(51865)
    assert tok.eot == 50257
    assert tok.sot == 50258
    assert tok.lang_token("en") == 50259
    assert tok.lang_token("zh") == 50260
    assert tok.translate == 50358
    assert tok.transcribe == 50359
    assert tok.no_speech == 50362
    assert tok.no_timestamps == 50363
    assert tok.ts_begin == 50364
    assert tok.num_languages == 99


def test_multilingual_v3_layout():
    tok = Tokenizer.synthetic(51866)
    assert tok.eot == 50257
    assert tok.sot == 50258
    assert tok.num_languages == 100
    assert tok.lang_token("yue") == 50259 + 99
    assert tok.ts_begin == 50365
    assert tok.timestamp_token(30.0) == 50365 + 1500


def test_english_layout():
    tok = Tokenizer.synthetic(51864)
    assert tok.eot == 50256
    assert tok.sot == 50257
    assert tok.ts_begin == 50363
    assert not tok.multilingual


def test_sot_sequence():
    tok = Tokenizer.synthetic(51865)
    assert tok.sot_sequence("zh") == [50258, 50260, 50359]
    assert tok.sot_sequence("en", task="translate") == [50258, 50259, 50358]
    assert tok.sot_sequence("en", timestamps=False)[-1] == tok.no_timestamps
    en_only = Tokenizer.synthetic(51864)
    assert en_only.sot_sequence("en") == [en_only.sot]


def test_timestamp_conversion():
    tok = Tokenizer.synthetic(51865)
    assert tok.timestamp_seconds(tok.timestamp_token(5.44)) == 5.44
    assert tok.is_timestamp(tok.ts_begin)
    assert not tok.is_timestamp(tok.ts_begin - 1)


def test_decode_and_encode_text():
    # byte alphabet + merge chain (BPE builds tokens bottom-up through the
    # intermediates, in id order — real GPT-2-family vocabs are laid out
    # exactly like this)
    vocab = [bytes([b]) for b in range(256)]
    vocab += [b"he", b"ll", b"llo", b"hello",      # 256..259
              b" w", b" wo", b"rl", b"rld"]        # 260..263
    tok = Tokenizer(vocab=vocab, n_vocab=51865, multilingual=True, num_languages=99)
    assert tok.decode([259, 261, 263]) == "hello world"
    # merge-order BPE: he+ll+o -> hello; " wo"+"rld" stay split (no " world")
    assert tok.encode_text("hello world") == [259, 261, 263]
    # specials skipped in decode by default
    assert tok.decode([259, tok.eot, 256]) == "hellohe"
    assert "<|endoftext|>" in tok.decode([259, tok.eot], skip_special=False)


def test_language_list_sane():
    assert len(LANGUAGES) == 100
    assert LANGUAGES[0] == "en"
    assert LANGUAGES[1] == "zh"
    assert LANGUAGES[-1] == "yue"


def test_suppress_mask():
    tok = Tokenizer.synthetic(51865)
    m = tok.suppress_mask()
    assert m[tok.sot] and m[tok.sot_prev] and m[tok.no_speech]
    assert m[tok.lang_token("en")] and m[tok.lang_token("su")]
    assert not m[tok.eot]
    assert not m[tok.ts_begin]
    assert not m[100]  # ordinary text token


def test_speaker_turn_token_detection():
    from speaksense_tpu.models.tokenizer import Tokenizer

    vocab = [b"a"] * 100
    vocab[50] = b"[_SOLM_]"
    tok = Tokenizer(vocab=vocab, n_vocab=51865, multilingual=True, num_languages=99)
    assert tok.speaker_turn_token() == 50
    m = tok.suppress_mask(allow_speaker_turn=True)
    assert not m[50]
    plain = Tokenizer.synthetic(51865)
    assert plain.speaker_turn_token() is None


def test_encode_text_is_merge_order_bpe():
    """encode_text must follow BPE merge priority (vocab id order), not
    greedy longest-match: with 'bc' ranked before 'ab', the word 'abc'
    merges b+c first -> [a, bc] (longest-match would emit [ab, c])."""
    from speaksense_tpu.models.tokenizer import Tokenizer

    vocab = [bytes([b]) for b in range(256)]       # byte alphabet, ids 0-255
    vocab += [b"bc", b"ab", b"abc_unused_filler"]  # bc=256 outranks ab=257
    tok = Tokenizer.from_vocab(vocab)
    ids = tok.encode_text("abc")
    assert ids == [ord("a"), 256], ids


def test_encode_text_roundtrips_bytes():
    from speaksense_tpu.models.tokenizer import Tokenizer

    vocab = [bytes([b]) for b in range(256)]
    vocab += [b"he", b"ll", b"hell", b"o w", b"orld"]
    tok = Tokenizer.from_vocab(vocab)
    text = "hello world!"
    assert tok.decode(tok.encode_text(text)) == text


def test_encode_text_respects_word_boundaries():
    """GPT-2 pre-tokenization: merges never span split-pattern boundaries —
    'a b' cannot merge into one 'a b' token even if the vocab has it."""
    from speaksense_tpu.models.tokenizer import Tokenizer

    vocab = [bytes([b]) for b in range(256)]
    vocab += [b"a b"]
    tok = Tokenizer.from_vocab(vocab)
    ids = tok.encode_text("a b")
    assert 256 not in ids  # words "a" and " b" tokenize separately
