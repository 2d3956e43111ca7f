"""StreamingServer tests: block path == model streaming scan, file helper,
lane reset, profiling utils."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fseend_tpu.models import ls_eend
from fseend_tpu.serving.runtime import StreamingServer, stream_file

CFG = ls_eend.LSEENDConfig(
    in_size=23, n_units=32, n_heads=4, enc_n_layers=1, dec_n_layers=1,
    dropout=0.0, chunk_size=8, ff_expansion=2, conv_kernel_size=5,
    dec_dim_feedforward=64, conv_delay=3, max_nspks=4)


@pytest.fixture(scope="module")
def server():
    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), CFG)
    return StreamingServer(kind="ls", cfg=CFG, params=params,
                           model_state=mstate, n_lanes=2, n_slots=4), params, mstate


def test_block_path_matches_model_scan(server, rng):
    srv, params, mstate = server
    T = 12
    feats = rng.standard_normal((2, T, CFG.in_size)).astype(np.float32)
    st = ls_eend.ls_stream_init(CFG, 2, n_slots=4)
    logits_ref, _ = ls_eend.ls_stream_scan(params, st, CFG, mstate,
                                           jnp.asarray(feats), 4)
    probs_ref = np.asarray(jax.nn.sigmoid(logits_ref[..., 1:]))

    srv.state = srv._init_state()
    pad = np.zeros((2, CFG.conv_delay, CFG.in_size), np.float32)
    xs = np.concatenate([feats, pad], axis=1)
    flush = np.arange(T + CFG.conv_delay) >= T
    p1, _ = srv.process_block(xs[:, :7], flush[:7])
    p2, _ = srv.process_block(xs[:, 7:], flush[7:])
    probs = np.concatenate([np.asarray(p1), np.asarray(p2)], axis=1)
    np.testing.assert_allclose(probs[:, CFG.conv_delay:], probs_ref, atol=1e-5)


def test_stream_file_helper(server, rng):
    srv, params, mstate = server
    srv.state = srv._init_state()
    feats = rng.standard_normal((15, CFG.in_size)).astype(np.float32)
    out = stream_file(srv, feats, block=6)
    assert out.shape == (15, 3)  # n_slots - 1
    st = ls_eend.ls_stream_init(CFG, 2, n_slots=4)
    logits_ref, _ = ls_eend.ls_stream_scan(
        params, st, CFG, mstate,
        jnp.broadcast_to(jnp.asarray(feats)[None], (2, 15, CFG.in_size)), 4)
    np.testing.assert_allclose(
        out, np.asarray(jax.nn.sigmoid(logits_ref[0, :, 1:])), atol=1e-5)


def test_lane_reset(server, rng):
    srv, params, mstate = server
    srv.state = srv._init_state()
    feats = rng.standard_normal((2, 6, CFG.in_size)).astype(np.float32)
    srv.process_block(feats)
    dirty = float(jnp.abs(srv.state["enc"][0]["ret"]["kv"][1]).sum())
    assert dirty > 0
    srv.reset_lanes([1])
    assert float(jnp.abs(srv.state["enc"][0]["ret"]["kv"][1]).sum()) == 0
    # lane 0 untouched
    assert float(jnp.abs(srv.state["enc"][0]["ret"]["kv"][0]).sum()) > 0


def test_step_timer_report():
    import time

    from fseend_tpu.utils.profiling import StepTimer

    t = StepTimer()
    for _ in range(5):
        with t:
            time.sleep(0.001)
    rep = t.report(frames_per_step=100)
    assert rep["steps"] == 5
    assert rep["p50_ms"] >= 1.0
    assert rep["rtf"] > 0


def test_block_streaming_server(rng):
    from fseend_tpu.serving.runtime import BlockStreamingServer
    import dataclasses

    cfgK = dataclasses.replace(CFG, chunk_size=6, dropout=0.0)
    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), cfgK)
    srv = BlockStreamingServer(cfg=cfgK, params=params, model_state=mstate,
                               n_lanes=1, n_slots=4, block=6)
    T = 12
    feats = rng.standard_normal((1, T, CFG.in_size)).astype(np.float32)
    _ = srv.process_block(feats[:, :6])          # warm-up output (garbage)
    p1 = srv.process_block(feats[:, 6:])         # emits block 0
    p2 = srv.process_block(np.zeros_like(feats[:, :6]), flush=True)  # block 1
    probs = np.concatenate([np.asarray(p1), np.asarray(p2)], axis=1)
    ref = ls_eend.ls_forward(params, mstate, cfgK, jnp.asarray(feats),
                             jnp.array([T]), 4, time_mode="chunkwise")
    ref_probs = np.asarray(jax.nn.sigmoid(ref["logits"][..., 1:]))
    np.testing.assert_allclose(probs, ref_probs, atol=1e-5)


def test_multichip_serving_lane_sharded(rng):
    """8 virtual devices serve 8x lanes: sharded result == single-device."""
    if jax.device_count() < 8:
        import pytest

        pytest.skip("needs 8 virtual devices (see tests/conftest.needs_mesh)")
    from fseend_tpu.parallel import mesh as pmesh
    from fseend_tpu.serving.runtime import StreamingServer, shard_server_over_mesh

    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), CFG)
    feats = rng.standard_normal((8, 6, CFG.in_size)).astype(np.float32)

    ref_srv = StreamingServer(kind="ls", cfg=CFG, params=params,
                              model_state=mstate, n_lanes=8, n_slots=4)
    p_ref, _ = ref_srv.process_block(feats)

    mesh = pmesh.make_mesh(n_data=8, n_model=1)
    srv = StreamingServer(kind="ls", cfg=CFG, params=params,
                          model_state=mstate, n_lanes=8, n_slots=4)
    with jax.set_mesh(mesh):
        shard_server_over_mesh(srv, mesh)
        p_sh, _ = srv.process_block(feats)
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref), atol=1e-5)
    # state stayed lane-sharded after the step
    sh = srv.state["enc"][0]["ret"]["kv"].sharding
    assert getattr(sh, "spec", None) is not None


def test_multichip_serving_frame_kernel(rng):
    """The frame-scan kernel server shards over the mesh too (explicit
    shard_map — GSPMD cannot split a pallas custom call): sharded ==
    single-device, two consecutive blocks (state stays lane-sharded)."""
    if jax.device_count() < 8:
        import pytest

        pytest.skip("needs 8 virtual devices (see tests/conftest.needs_mesh)")
    from fseend_tpu.parallel import mesh as pmesh
    from fseend_tpu.serving.runtime import StreamingServer, shard_server_over_mesh

    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), CFG)
    blocks = [rng.standard_normal((8, 6, CFG.in_size)).astype(np.float32)
              for _ in range(2)]

    ref_srv = StreamingServer(kind="ls", cfg=CFG, params=params,
                              model_state=mstate, n_lanes=8, n_slots=4,
                              frame_kernel=True)
    mesh = pmesh.make_mesh(n_data=8, n_model=1)
    srv = StreamingServer(kind="ls", cfg=CFG, params=params,
                          model_state=mstate, n_lanes=8, n_slots=4,
                          frame_kernel=True)
    with jax.set_mesh(mesh):
        shard_server_over_mesh(srv, mesh)
        for blk in blocks:
            p_ref, _ = ref_srv.process_block(blk)
            p_sh, _ = srv.process_block(blk)
            np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref),
                                       atol=1e-5)


def test_bf16_serving_states_stable(rng):
    """bf16 lane state survives the scan (dtype-preserving updates) and
    tracks the f32 path within bf16 tolerance."""
    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), CFG)
    feats = rng.standard_normal((1, 10, CFG.in_size)).astype(np.float32)
    srv32 = StreamingServer(kind="ls", cfg=CFG, params=params,
                            model_state=mstate, n_lanes=1, n_slots=4)
    p32, _ = srv32.process_block(feats)
    p_bf = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and
        x.dtype == jnp.float32 else x, params)
    srv16 = StreamingServer(kind="ls", cfg=CFG, params=p_bf,
                            model_state=mstate, n_lanes=1, n_slots=4,
                            dtype=jnp.bfloat16)
    p16, _ = srv16.process_block(feats.astype(jnp.bfloat16))
    assert np.abs(np.asarray(p16, np.float32) - np.asarray(p32)).max() < 0.1


def test_fs_block_streaming_server(rng):
    from fseend_tpu.models import fs_eend
    from fseend_tpu.serving.runtime import BlockStreamingServer

    cfg = fs_eend.FSEENDConfig(
        in_size=23, n_units=32, n_heads=4, enc_n_layers=1, dec_n_layers=1,
        enc_dim_feedforward=64, dec_dim_feedforward=64, dropout=0.0,
        conv_delay=2, max_nspks=4)
    params, mstate = fs_eend.init_fs_eend(jax.random.PRNGKey(0), cfg)
    srv = BlockStreamingServer(cfg=cfg, params=params, model_state=mstate,
                               n_lanes=1, n_slots=4, block=6, kind="fs",
                               capacity=32)
    T = 12
    feats = rng.standard_normal((1, T, cfg.in_size)).astype(np.float32)
    _ = srv.process_block(feats[:, :6])
    p1 = srv.process_block(feats[:, 6:])
    p2 = srv.process_block(np.zeros_like(feats[:, :6]), flush=True)
    probs = np.concatenate([np.asarray(p1), np.asarray(p2)], axis=1)
    ref = fs_eend.fs_forward(params, mstate, cfg, jnp.asarray(feats),
                             jnp.array([T]), 4)
    ref_probs = np.asarray(jax.nn.sigmoid(ref["logits"][..., 1:]))
    np.testing.assert_allclose(probs, ref_probs, atol=1e-5)
    # per-lane reset is LS-only: FS must refuse with a clear error, not a
    # KeyError on LS-shaped state keys
    with pytest.raises(ValueError, match="LS-only"):
        srv.reset_lanes([0])


def test_fs_blockwise_capacity_guard(rng):
    """Feeding an FS blockwise stream past its preallocated KV capacity must
    raise — dynamic_update_slice would clamp the write start and silently
    corrupt the cache tail otherwise. Flush blocks (encoder bypassed,
    nothing written) and reset_all() don't count against capacity."""
    from fseend_tpu.models import fs_eend
    from fseend_tpu.serving.runtime import BlockStreamingServer

    cfg = fs_eend.FSEENDConfig(
        in_size=23, n_units=32, n_heads=4, enc_n_layers=1, dec_n_layers=1,
        enc_dim_feedforward=64, dec_dim_feedforward=64, dropout=0.0,
        conv_delay=2, max_nspks=4)
    params, mstate = fs_eend.init_fs_eend(jax.random.PRNGKey(0), cfg)
    srv = BlockStreamingServer(cfg=cfg, params=params, model_state=mstate,
                               n_lanes=1, n_slots=4, block=6, kind="fs",
                               capacity=12)
    feats = rng.standard_normal((1, 6, cfg.in_size)).astype(np.float32)
    srv.process_block(feats)
    srv.process_block(feats)
    srv.process_block(np.zeros_like(feats), flush=True)  # no capacity cost
    with pytest.raises(ValueError, match="capacity"):
        srv.process_block(feats)
    srv.reset_all()
    srv.process_block(feats)  # fresh stream fits again


def test_raw_audio_pipeline_matches_offline(rng):
    """Raw audio blocks -> StreamingLogmel -> BlockStreamingServer == offline
    host featurization + batch forward, for LS and FS, with a ragged sample
    tail (the live-stream serving path; reference has no such server — its
    demos featurize the whole wav up front, streaming_infer_dia.py:24-36)."""
    import dataclasses

    from fseend_tpu.models import fs_eend
    from fseend_tpu.ops import features as F
    from fseend_tpu.serving.raw_audio import stream_audio_file
    from fseend_tpu.serving.runtime import BlockStreamingServer

    c, sub, K = 1, 2, 5
    in_size = (2 * c + 1) * 23
    n = 800 * 3 + 137  # ragged: not a multiple of the audio block
    audio = rng.standard_normal((n,)).astype(np.float32) * 0.1

    def offline_feats(tf):
        Y = F.transform(F.stft(audio, 200, 80), tf)
        return F.subsample(F.splice(Y, c), subsampling=sub)

    feat_kw = dict(frame_size=200, frame_shift=80, context_size=c,
                   subsampling=sub)

    # --- LS (causal cumulative-mean norm) ---
    cfg = dataclasses.replace(CFG, in_size=in_size, chunk_size=K)
    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), cfg)
    srv = BlockStreamingServer(cfg=cfg, params=params, model_state=mstate,
                               n_lanes=1, n_slots=4, block=K)
    got = stream_audio_file(srv, audio, input_transform="logmel23_cummn",
                            **feat_kw)
    feats = offline_feats("logmel23_cummn")
    ref = ls_eend.ls_forward(params, mstate, cfg, jnp.asarray(feats)[None],
                             jnp.array([len(feats)]), 4,
                             time_mode="chunkwise")
    ref_probs = np.asarray(jax.nn.sigmoid(ref["logits"][..., 1:]))[0]
    assert got.shape == ref_probs.shape
    np.testing.assert_allclose(got, ref_probs, atol=1e-4)

    # --- FS (raw logmel) ---
    fcfg = fs_eend.FSEENDConfig(
        in_size=in_size, n_units=32, n_heads=4, enc_n_layers=1,
        dec_n_layers=1, enc_dim_feedforward=64, dec_dim_feedforward=64,
        dropout=0.0, conv_delay=2, max_nspks=4)
    fparams, fmstate = fs_eend.init_fs_eend(jax.random.PRNGKey(1), fcfg)
    fsrv = BlockStreamingServer(cfg=fcfg, params=fparams, model_state=fmstate,
                                n_lanes=1, n_slots=4, block=K, kind="fs",
                                capacity=256)
    got = stream_audio_file(fsrv, audio, input_transform="logmel23", **feat_kw)
    feats = offline_feats("logmel23")
    ref = fs_eend.fs_forward(fparams, fmstate, fcfg, jnp.asarray(feats)[None],
                             jnp.array([len(feats)]), 4)
    ref_probs = np.asarray(jax.nn.sigmoid(ref["logits"][..., 1:]))[0]
    assert got.shape == ref_probs.shape
    np.testing.assert_allclose(got, ref_probs, atol=1e-4)


def test_aot_exported_server_matches_live(rng, tmp_path):
    """save_server freezes a BlockStreamingServer to a self-contained
    artifact (StableHLO + baked-in weights); AotBlockServer reproduces the
    live server bit-for-bit without touching model code or checkpoints."""
    import dataclasses

    from fseend_tpu.serving.aot import AotBlockServer, save_server
    from fseend_tpu.serving.runtime import BlockStreamingServer

    cfgK = dataclasses.replace(CFG, chunk_size=6, dropout=0.0)
    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), cfgK)
    live = BlockStreamingServer(cfg=cfgK, params=params, model_state=mstate,
                                n_lanes=2, n_slots=4, block=6)
    path = str(tmp_path / "srv.npz")
    save_server(live, path)
    aot = AotBlockServer(path)
    assert aot.meta["kind"] == "ls" and aot.block == 6

    feats = rng.standard_normal((2, 18, CFG.in_size)).astype(np.float32)
    for st in range(0, 18, 6):
        p_live = np.asarray(live.process_block(feats[:, st:st + 6]))
        p_aot = np.asarray(aot.process_block(feats[:, st:st + 6]))
        np.testing.assert_array_equal(p_live, p_aot)
    zeros = np.zeros((2, 6, CFG.in_size), np.float32)
    np.testing.assert_array_equal(
        np.asarray(live.process_block(zeros, flush=True)),
        np.asarray(aot.process_block(zeros, flush=True)))
    # reset + ragged-tail h_mask path
    aot.reset_all()
    live.reset_all()
    mask = np.arange(6) < 4
    np.testing.assert_array_equal(
        np.asarray(live.process_block(feats[:, :6], h_mask=mask)),
        np.asarray(aot.process_block(feats[:, :6], h_mask=mask)))


def test_aot_export_after_processing_is_pristine(rng, tmp_path):
    """Freezing a server that already processed blocks must NOT bake its
    mid-stream state into the artifact's `init` — a fresh AotBlockServer
    behaves like a fresh live server, and FS artifacts carry the capacity
    guard in their meta."""
    import dataclasses

    from fseend_tpu.models import fs_eend
    from fseend_tpu.serving.aot import AotBlockServer, save_server
    from fseend_tpu.serving.runtime import BlockStreamingServer

    cfgK = dataclasses.replace(CFG, chunk_size=6, dropout=0.0)
    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), cfgK)
    live = BlockStreamingServer(cfg=cfgK, params=params, model_state=mstate,
                                n_lanes=2, n_slots=4, block=6)
    feats = rng.standard_normal((2, 12, CFG.in_size)).astype(np.float32)
    live.process_block(feats[:, :6])
    live.process_block(feats[:, 6:])          # server is now mid-stream
    path = str(tmp_path / "srv_dirty.npz")
    save_server(live, path)
    aot = AotBlockServer(path)
    fresh = BlockStreamingServer(cfg=cfgK, params=params, model_state=mstate,
                                 n_lanes=2, n_slots=4, block=6)
    for st in (0, 6):
        np.testing.assert_array_equal(
            np.asarray(fresh.process_block(feats[:, st:st + 6])),
            np.asarray(aot.process_block(feats[:, st:st + 6])))

    # FS artifact: capacity recorded + enforced after load
    fs_cfg = fs_eend.FSEENDConfig(
        in_size=23, n_units=32, n_heads=4, enc_n_layers=1, dec_n_layers=1,
        enc_dim_feedforward=64, dec_dim_feedforward=64, dropout=0.0,
        conv_delay=2, max_nspks=4)
    fparams, fmstate = fs_eend.init_fs_eend(jax.random.PRNGKey(1), fs_cfg)
    fsrv = BlockStreamingServer(cfg=fs_cfg, params=fparams, model_state=fmstate,
                                n_lanes=1, n_slots=4, block=6, kind="fs",
                                capacity=12)
    fpath = str(tmp_path / "fs_srv.npz")
    save_server(fsrv, fpath)
    faot = AotBlockServer(fpath)
    assert faot.capacity == 12
    f = rng.standard_normal((1, 6, fs_cfg.in_size)).astype(np.float32)
    faot.process_block(f)
    faot.process_block(f)
    with pytest.raises(ValueError, match="capacity"):
        faot.process_block(f)
    faot.reset_all()
    faot.process_block(f)


def test_multichip_block_server_lane_sharded(rng):
    """BlockStreamingServer lanes shard over the data axis with zero
    collectives: 8-device result == single-device."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices (see tests/conftest.needs_mesh)")
    import dataclasses

    from fseend_tpu.parallel import mesh as pmesh
    from fseend_tpu.serving.runtime import (BlockStreamingServer,
                                            shard_server_over_mesh)

    cfgK = dataclasses.replace(CFG, chunk_size=6, dropout=0.0)
    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), cfgK)
    feats = rng.standard_normal((8, 12, CFG.in_size)).astype(np.float32)

    ref_srv = BlockStreamingServer(cfg=cfgK, params=params, model_state=mstate,
                                   n_lanes=8, n_slots=4, block=6)
    p_ref = [np.asarray(ref_srv.process_block(feats[:, s:s + 6]))
             for s in (0, 6)]

    mesh = pmesh.make_mesh(n_data=8, n_model=1)
    srv = BlockStreamingServer(cfg=cfgK, params=params, model_state=mstate,
                               n_lanes=8, n_slots=4, block=6)
    with jax.set_mesh(mesh):
        shard_server_over_mesh(srv, mesh)
        p_sh = [np.asarray(srv.process_block(feats[:, s:s + 6]))
                for s in (0, 6)]
    np.testing.assert_allclose(p_sh[1], p_ref[1], atol=1e-5)


def test_raw_audio_pipeline_over_aot_artifact(rng, tmp_path):
    """Composition: a frozen AOT artifact serves raw audio through
    RawAudioPipeline (same process_block protocol), matching the live
    server's pipeline output exactly."""
    import dataclasses

    from fseend_tpu.serving.aot import AotBlockServer, save_server
    from fseend_tpu.serving.raw_audio import stream_audio_file
    from fseend_tpu.serving.runtime import BlockStreamingServer

    c, sub, K = 1, 2, 5
    cfg = dataclasses.replace(CFG, in_size=(2 * c + 1) * 23, chunk_size=K)
    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), cfg)
    live = BlockStreamingServer(cfg=cfg, params=params, model_state=mstate,
                                n_lanes=1, n_slots=4, block=K)
    path = str(tmp_path / "srv.npz")
    save_server(live, path)
    live.reset_all()
    aot = AotBlockServer(path)

    audio = rng.standard_normal((800 * 2 + 57,)).astype(np.float32) * 0.1
    kw = dict(frame_size=200, frame_shift=80, context_size=c,
              subsampling=sub, input_transform="logmel23_cummn")
    p_live = stream_audio_file(live, audio, **kw)
    p_aot = stream_audio_file(aot, audio, **kw)
    np.testing.assert_array_equal(p_live, p_aot)


def _make_server(kind, params, mstate, cfg, n_lanes=2):
    return StreamingServer(kind=kind, cfg=cfg, params=params,
                           model_state=mstate, n_lanes=n_lanes, n_slots=4,
                           capacity=64)


def _family(kind):
    from fseend_tpu.models import fs_eend

    if kind == "ls":
        params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), CFG)
        return CFG, params, mstate
    fcfg = fs_eend.FSEENDConfig(
        in_size=CFG.in_size, n_units=32, n_heads=4, enc_n_layers=1,
        dec_n_layers=1, enc_dim_feedforward=64, dec_dim_feedforward=64,
        dropout=0.0, conv_delay=2, max_nspks=4)
    params, mstate = fs_eend.init_fs_eend(jax.random.PRNGKey(0), fcfg)
    return fcfg, params, mstate


@pytest.mark.parametrize("kind", ["ls", "fs"])
def test_per_lane_reset_is_bitexact(rng, kind):
    """reset_lanes mid-stream: the reused lane reproduces a FRESH server
    bit-for-bit (per-lane stream clocks + per-slot decoder state reset)
    while its neighbour continues uninterrupted; also covers
    reset-after-donated-step (round-2 fix: _zero_state must not alias
    donated buffers)."""
    cfg, params, mstate = _family(kind)
    A = rng.standard_normal((2, 10, cfg.in_size)).astype(np.float32)
    B = rng.standard_normal((2, 10, cfg.in_size)).astype(np.float32)

    srv = _make_server(kind, params, mstate, cfg)
    srv.process_block(A)
    srv.reset_lanes([1])
    p, v = srv.process_block(B)

    fresh = _make_server(kind, params, mstate, cfg)
    pf, vf = fresh.process_block(B)
    np.testing.assert_array_equal(np.asarray(p[1]), np.asarray(pf[1]))
    np.testing.assert_array_equal(np.asarray(v)[:, 1], np.asarray(vf)[:, 1])
    # lane 0 kept its stream-A state (outputs differ from a fresh pass)
    assert np.abs(np.asarray(p[0]) - np.asarray(pf[0])).max() > 0


@pytest.mark.parametrize("kind", ["ls", "fs"])
def test_continuous_batcher_matches_isolated_streams(rng, kind):
    """Heterogeneous streams multiplexed over 2 lanes (arrivals mid-flight,
    lane reuse, per-lane flush) == each stream served alone == the model's
    own fused scan."""
    from fseend_tpu.models import fs_eend
    from fseend_tpu.serving.scheduler import ContinuousBatcher

    cfg, params, mstate = _family(kind)
    streams = {f"s{i}": rng.standard_normal((T, cfg.in_size)).astype(np.float32)
               for i, T in enumerate([7, 23, 12, 5, 17])}

    srv = _make_server(kind, params, mstate, cfg)
    cb = ContinuousBatcher(srv, block=6)
    cb.submit("s0", streams["s0"])
    cb.submit("s1", streams["s1"])
    cb.step()                       # s0/s1 in flight...
    cb.submit("s2", streams["s2"])  # ...late arrivals
    cb.submit("s3", streams["s3"])
    cb.submit("s4", streams["s4"])
    got = cb.run()
    assert set(got) == set(streams)

    for sid, feats in streams.items():
        ref = _make_server(kind, params, mstate, cfg)
        alone = ContinuousBatcher(ref, block=6)
        alone.submit(sid, feats)
        ref_out = alone.run()[sid]
        assert got[sid].shape == (len(feats), 3)
        # ULP-level only: XLA's batched kernels aren't bit-invariant to
        # neighbor-lane content (vectorization layout), so multiplexed vs
        # alone is allclose, not array_equal
        np.testing.assert_allclose(got[sid], ref_out, atol=1e-6)

    # and the scheduler's output equals the model's own fused scan
    sid, feats = "s1", streams["s1"]
    if kind == "ls":
        st = ls_eend.ls_stream_init(cfg, 1, n_slots=4)
        logits, _ = ls_eend.ls_stream_scan(params, st, cfg, mstate,
                                           jnp.asarray(feats)[None], 4)
    else:
        st = fs_eend.fs_stream_init(cfg, 1, len(feats) + cfg.conv_delay, 4)
        logits, _ = fs_eend.fs_stream_scan(params, st, cfg, mstate["bn"],
                                           jnp.asarray(feats)[None], 4)
    ref_probs = np.asarray(jax.nn.sigmoid(logits[..., 1:]))[0]
    np.testing.assert_allclose(got[sid], ref_probs, atol=1e-5)


@pytest.mark.parametrize("kind", ["ls", "fs"])
def test_continuous_batcher_short_and_empty_streams(rng, kind):
    """Streams shorter than conv_delay emit entirely during flush (the
    stream clock counts steps, not real frames — a frozen clock would hang
    the scheduler); zero-length streams complete with an empty result."""
    from fseend_tpu.models import fs_eend
    from fseend_tpu.serving.scheduler import ContinuousBatcher

    cfg, params, mstate = _family(kind)
    short = rng.standard_normal((2, cfg.in_size)).astype(np.float32)
    cb = ContinuousBatcher(_make_server(kind, params, mstate, cfg), block=6)
    cb.submit("empty", np.zeros((0, cfg.in_size), np.float32))
    cb.submit("short", short)
    got = cb.run()
    assert got["empty"].shape == (0, 3)
    if kind == "ls":
        st = ls_eend.ls_stream_init(cfg, 1, n_slots=4)
        logits, _ = ls_eend.ls_stream_scan(params, st, cfg, mstate,
                                           jnp.asarray(short)[None], 4)
    else:
        st = fs_eend.fs_stream_init(cfg, 1, 2 + cfg.conv_delay, 4)
        logits, _ = fs_eend.fs_stream_scan(params, st, cfg, mstate["bn"],
                                           jnp.asarray(short)[None], 4)
    ref = np.asarray(jax.nn.sigmoid(logits[..., 1:]))[0]
    np.testing.assert_allclose(got["short"], ref, atol=1e-5)


def test_block_server_per_lane_reset_exact(rng):
    """BlockStreamingServer (LS) lane reuse: per-lane block counter re-gates
    the reused lane's warm-up block, so it reproduces a fresh server exactly
    (the shared-m bug let warm-up garbage pollute decoder retention state,
    |dp| up to 2.3e-3)."""
    import dataclasses

    from fseend_tpu.serving.runtime import BlockStreamingServer

    cfgK = dataclasses.replace(CFG, chunk_size=6, dropout=0.0)
    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), cfgK)
    A = rng.standard_normal((2, 12, CFG.in_size)).astype(np.float32)
    B = rng.standard_normal((2, 12, CFG.in_size)).astype(np.float32)

    srv = BlockStreamingServer(cfg=cfgK, params=params, model_state=mstate,
                               n_lanes=2, n_slots=4, block=6)
    srv.process_block(A[:, :6])
    srv.process_block(A[:, 6:])
    srv.reset_lanes([1])
    outs = [np.asarray(srv.process_block(B[:, :6]))[1],
            np.asarray(srv.process_block(B[:, 6:]))[1]]

    fresh = BlockStreamingServer(cfg=cfgK, params=params, model_state=mstate,
                                 n_lanes=2, n_slots=4, block=6)
    ref = [np.asarray(fresh.process_block(B[:, :6]))[1],
           np.asarray(fresh.process_block(B[:, 6:]))[1]]
    np.testing.assert_array_equal(outs[1], ref[1])


def test_blockstream_pallas_flag_reaches_kernel(rng):
    """use_pallas propagates into the blockwise serving path (the round-2
    review found _block_ret_cfg silently dropped it — bench's xla-vs-pallas
    comparison was XLA against itself) and the kernel output matches XLA."""
    import dataclasses

    from fseend_tpu.models.ls_eend import _block_ret_cfg

    cfgP = dataclasses.replace(CFG, chunk_size=8, dropout=0.0, use_pallas=True)
    assert _block_ret_cfg(cfgP, 8).use_pallas
    params, mstate = ls_eend.init_ls_eend(jax.random.PRNGKey(0), cfgP)
    xs = rng.standard_normal((1, 8, CFG.in_size)).astype(np.float32)
    st_p = ls_eend.ls_blockstream_init(cfgP, 1, 4, 8)
    _, lg_p = ls_eend.ls_blockstream_step(params, st_p, cfgP, mstate,
                                          jnp.asarray(xs), 4)
    cfgX = dataclasses.replace(cfgP, use_pallas=False)
    st_x = ls_eend.ls_blockstream_init(cfgX, 1, 4, 8)
    _, lg_x = ls_eend.ls_blockstream_step(params, st_x, cfgX, mstate,
                                          jnp.asarray(xs), 4)
    np.testing.assert_allclose(np.asarray(lg_p), np.asarray(lg_x), atol=1e-5)


def test_aot_export_fs_and_duplicate_sid(rng, tmp_path):
    """FS servers freeze/load too; ContinuousBatcher rejects duplicate
    stream ids instead of silently dropping a result."""
    from fseend_tpu.serving.aot import AotBlockServer, save_server
    from fseend_tpu.serving.runtime import BlockStreamingServer
    from fseend_tpu.serving.scheduler import ContinuousBatcher

    cfg, params, mstate = _family("fs")
    live = BlockStreamingServer(cfg=cfg, params=params, model_state=mstate,
                                n_lanes=1, n_slots=4, block=6, kind="fs",
                                capacity=32)
    path = str(tmp_path / "fs_srv.npz")
    save_server(live, path)
    live.reset_all()
    aot = AotBlockServer(path)
    feats = rng.standard_normal((1, 6, cfg.in_size)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(live.process_block(feats)),
                                  np.asarray(aot.process_block(feats)))

    cb = ContinuousBatcher(_make_server("ls", *_family("ls")[1:], CFG), block=6)
    cb.submit("a", rng.standard_normal((4, CFG.in_size)).astype(np.float32))
    with pytest.raises(ValueError, match="duplicate"):
        cb.submit("a", rng.standard_normal((4, CFG.in_size)).astype(np.float32))
    # FS capacity guard
    fs_cb = ContinuousBatcher(
        StreamingServer(kind="fs", cfg=cfg, params=params, model_state=mstate,
                        n_lanes=1, n_slots=4, capacity=8), block=6)
    with pytest.raises(ValueError, match="capacity"):
        fs_cb.submit("big", np.zeros((100, cfg.in_size), np.float32))


def test_fs_fast_block_matches_scan_through_server(rng):
    """StreamingServer(kind=fs): the shipped fs_fast path == the
    frame-by-frame oracle scan THROUGH the server surface (probs + valid
    via process_block incl. an odd sub-block split, and the step()
    route), not just at the model level."""
    cfg, params, mstate = _family("fs")
    feats = rng.standard_normal((2, 12, cfg.in_size)).astype(np.float32)

    def run(fast, chunk=None):
        srv = StreamingServer(kind="fs", cfg=cfg, params=params,
                              model_state=mstate, n_lanes=2, n_slots=4,
                              capacity=32, fs_fast=fast,
                              fs_fast_chunk=chunk)
        p, v = srv.process_block(feats)
        return np.asarray(p), np.asarray(v)

    p_ref, v_ref = run(False)
    for chunk in (None, 3, 1):
        p, v = run(True, chunk)
        np.testing.assert_array_equal(v, v_ref)
        np.testing.assert_allclose(p, p_ref, atol=2e-5)

    # step() route (K=1 fast block) == the scan's step
    fast_srv = StreamingServer(kind="fs", cfg=cfg, params=params,
                               model_state=mstate, n_lanes=2, n_slots=4,
                               capacity=32, fs_fast=True)
    slow_srv = StreamingServer(kind="fs", cfg=cfg, params=params,
                               model_state=mstate, n_lanes=2, n_slots=4,
                               capacity=32, fs_fast=False)
    for t in range(6):
        pf, vf = fast_srv.step(feats[:, t])
        ps, vs = slow_srv.step(feats[:, t])
        np.testing.assert_array_equal(np.asarray(vf), np.asarray(vs))
        np.testing.assert_allclose(np.asarray(pf), np.asarray(ps),
                                   atol=2e-5)


def test_multichip_fs_fast_lane_sharded(rng):
    """The FS fast-block server shards its lane axis over the mesh (pure
    XLA — GSPMD partitions it, zero cross-chip collectives): sharded ==
    single-device across two consecutive blocks."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices (see tests/conftest.needs_mesh)")
    from fseend_tpu.parallel import mesh as pmesh
    from fseend_tpu.serving.runtime import shard_server_over_mesh

    cfg, params, mstate = _family("fs")
    blocks = [rng.standard_normal((8, 6, cfg.in_size)).astype(np.float32)
              for _ in range(2)]
    ref_srv = StreamingServer(kind="fs", cfg=cfg, params=params,
                              model_state=mstate, n_lanes=8, n_slots=4,
                              capacity=32)
    mesh = pmesh.make_mesh(n_data=8, n_model=1)
    srv = StreamingServer(kind="fs", cfg=cfg, params=params,
                          model_state=mstate, n_lanes=8, n_slots=4,
                          capacity=32)
    with jax.set_mesh(mesh):
        shard_server_over_mesh(srv, mesh)
        for blk in blocks:
            p_ref, v_ref = ref_srv.process_block(blk)
            p_sh, v_sh = srv.process_block(blk)
            np.testing.assert_array_equal(np.asarray(v_sh),
                                          np.asarray(v_ref))
            np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref),
                                       atol=1e-5)
