"""Harness-layer tests: schedulers, optimizer factory, chunked inference, x8
augmentation, noise transforms, dataset registry, experiment cache, TrainModule
loss dispatch, offline trainer smoke, and adaptation wrappers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from frame2frame_tpu.config import Config


# ---------------------------------------------------------------- schedules --


def test_exp_decay_schedule():
    from frame2frame_tpu.train.schedules import make_schedule

    cfg = Config(scheduler_name="exp_decay", lr_init=1e-3, lr_final=1e-6,
                 nepochs=10)
    sched = make_schedule(cfg, steps_per_epoch=5)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(10 * 5)) == pytest.approx(1e-6, rel=1e-3)


def test_cosa_schedule():
    from frame2frame_tpu.train.schedules import make_schedule

    cfg = Config(scheduler_name="cosa", lr_init=1e-3, nepochs=4)
    sched = make_schedule(cfg, steps_per_epoch=2)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(8)) < 1e-6


def test_multi_step_schedule():
    from frame2frame_tpu.train.schedules import make_schedule

    cfg = Config(scheduler_name="multi_step", lr_init=1.0,
                 step_lr_multisteps="2-4", step_lr_gamma=0.1, nepochs=6)
    sched = make_schedule(cfg, steps_per_epoch=1)
    assert float(sched(1)) == pytest.approx(1.0)
    assert float(sched(3)) == pytest.approx(0.1)
    assert float(sched(5)) == pytest.approx(0.01)


# ------------------------------------------------------------------- chunks --


def test_chunked_identity_matches():
    from frame2frame_tpu.eval.chunks import chunk

    cfg = Config(spatial_chunk_size=8, spatial_chunk_overlap=0.25,
                 temporal_chunk_size=2)
    fwd = chunk(cfg, lambda v, fl=None: v * 2.0)
    vid = jnp.asarray(np.random.default_rng(0).random((1, 4, 20, 20, 1)),
                      jnp.float32)
    out = fwd(vid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vid) * 2.0,
                               rtol=1e-6)


def test_chunk_passthrough_when_disabled():
    from frame2frame_tpu.eval.chunks import chunk

    f = lambda v, fl=None: v
    assert chunk(Config(), f) is f


# ---------------------------------------------------------------------- aug --


def test_x8_identity():
    from frame2frame_tpu.eval.aug import test_x8

    vid = jnp.asarray(np.random.default_rng(1).random((1, 2, 8, 8, 1)),
                      jnp.float32)
    out = test_x8(lambda v, fl=None: v, vid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vid), atol=1e-6)


def test_x8_rectangular():
    from frame2frame_tpu.eval.aug import test_x8

    vid = jnp.asarray(np.random.default_rng(2).random((1, 2, 6, 10, 1)),
                      jnp.float32)
    out = test_x8(lambda v, fl=None: v * 3.0, vid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vid) * 3.0,
                               atol=1e-5)


# -------------------------------------------------------------------- noise --


def test_gaussian_noise_stats():
    from frame2frame_tpu.data.noise import choose_noise_transform

    tr = choose_noise_transform(Config(ntype="g", sigma=25))
    clean = jnp.full((2, 4, 32, 32, 1), 128.0)
    noisy = tr(jax.random.PRNGKey(0), clean)
    resid = np.asarray(noisy - clean)
    assert abs(resid.std() - 25) < 1.0
    assert abs(resid.mean()) < 1.0


def test_msg_noise_sigma_range():
    from frame2frame_tpu.data.noise import choose_noise_transform

    tr = choose_noise_transform(Config(ntype="msg", sigma_min=10, sigma_max=20))
    clean = jnp.zeros((4, 2, 32, 32, 1))
    noisy, sigma = tr(jax.random.PRNGKey(1), clean, return_sigma=True)
    s = np.asarray(sigma)
    assert ((s >= 10) & (s <= 20)).all()
    stds = np.asarray(noisy).std(axis=(1, 2, 3, 4))
    np.testing.assert_allclose(stds, s, rtol=0.1)


def test_pg_noise_runs():
    from frame2frame_tpu.data.noise import choose_noise_transform

    tr = choose_noise_transform(Config(ntype="pg", rate=10, sigma=2))
    clean = jnp.full((1, 1, 16, 16, 1), 100.0)
    noisy = tr(jax.random.PRNGKey(2), clean)
    assert np.isfinite(np.asarray(noisy)).all()


# --------------------------------------------------------------------- data --


def test_synthetic_dataset():
    from frame2frame_tpu.data import filter_subseq, sets

    cfg = Config(dname="synthetic", nvideos=2, nframes_data=4,
                 isize_data=(32, 32), ntype="g", sigma=25)
    data, loaders = sets.load(cfg)
    assert len(data.tr) == 2
    s = data.tr[0]
    assert s.noisy.shape == (4, 32, 32, 1)
    assert s.clean.shape == (4, 32, 32, 1)
    # determinism
    s2 = data.tr[0]
    np.testing.assert_array_equal(s.noisy, s2.noisy)
    idx = filter_subseq(data.tr, "vid01", 0, 2)
    assert idx == [1]


# -------------------------------------------------------------------- cache --


def test_cache_skip_done(tmp_path):
    from frame2frame_tpu import cache

    calls = []

    def run_fn(cfg):
        calls.append(cfg.x)
        return {"y": cfg.x * 2}

    exps = cache.load_edata({"base_k": 1}, {"x": [1, 2]})
    assert len(exps) == 2
    recs = cache.run_exps(exps, run_fn, cache_dir=tmp_path, verbose=False)
    assert calls == [1, 2]
    assert recs[0]["results"]["y"] == 2
    # second run: all cached
    recs2 = cache.run_exps(exps, run_fn, cache_dir=tmp_path, verbose=False)
    assert calls == [1, 2]
    assert recs2[1]["results"]["y"] == 4


# ---------------------------------------------------------------- TrainModule --


@pytest.fixture(scope="module")
def tiny_model():
    from frame2frame_tpu.models.dncnn import init_dncnn

    return init_dncnn(jax.random.PRNGKey(0), channels=1, num_layers=4,
                      residual=True, spatial=(16, 16))


@pytest.mark.parametrize("crit_name", ["sup", "n2n", "warped", "nb2nb", "b2u"])
def test_training_step_crits(tiny_model, crit_name):
    from frame2frame_tpu.train.lit import TrainModule
    from frame2frame_tpu.train.schedules import make_optimizer
    from frame2frame_tpu.train.state import TrainState

    model, variables = tiny_model
    cfg = Config(crit_name=crit_name, nepochs=2, lr_init=1e-3, ntype="g",
                 sigma=25, flow=False, wt=1, rate=-1)
    module = TrainModule(cfg, model, residual=True)
    tx, _ = make_optimizer(module.cfg)
    state = TrainState.create(model, variables, tx, residual=True)

    rng = np.random.default_rng(0)
    clean = rng.random((1, 3, 16, 16, 1)).astype(np.float32) * 255
    batch = Config(noisy=clean + rng.normal(0, 25, clean.shape), clean=clean)
    state2, metrics = module.training_step(state, batch, epoch=0,
                                           key=jax.random.PRNGKey(1))
    assert np.isfinite(metrics.train_loss)
    assert state2.step == 1
    # params actually changed
    delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.params, state2.params)
    assert max(jax.tree.leaves(delta)) > 0


def test_trainer_sup_learns(tmp_path):
    """2-epoch supervised training on tiny synthetic data reduces val loss."""
    from frame2frame_tpu.train import trainer

    cfg = Config(
        net_name="dncnn", channels=1, num_of_layers=4, seed=0,
        dname="synthetic", nvideos=2, nframes_data=3, isize_data=(32, 32),
        ntype="g", sigma=25, crit_name="sup", nepochs=2, lr_init=1e-3,
        scheduler_name="cosa", flow=False, checkpoint_dir=str(tmp_path),
    )
    out = trainer.run(cfg)
    assert "val_psnr" in out
    assert np.isfinite(out["train_loss"])
    import os

    assert any(f.endswith("final.msgpack") for f in os.listdir(tmp_path))


def test_adapt_wrapper(tiny_model):
    from frame2frame_tpu import get_loss_fxn
    from frame2frame_tpu.train.schedules import make_optimizer
    from frame2frame_tpu.train.state import TrainState

    model, variables = tiny_model
    cfg = Config(loss_type="f2f", adapt_isize="16_16", adapt_nepochs=1,
                 nbatch_sample=1, flow=False)
    loss_fxn = get_loss_fxn(cfg, "f2f")
    tx, _ = make_optimizer(Config(scheduler_name="none", lr_init=1e-4,
                                  nepochs=1))
    state = TrainState.create(model, variables, tx, residual=True)
    rng = np.random.default_rng(3)
    noisy = rng.random((1, 6, 24, 24, 1)).astype(np.float32)
    state2, info = loss_fxn(state, noisy, noisy.copy())
    assert len(info.loss) == 2  # (T - nf + 1) = 2 windows x 1 epoch
    assert all(np.isfinite(v) for v in info.loss)


def test_strip_prefix():
    from frame2frame_tpu.models.serialization import strip_prefix

    sd = {"net.dncnn.0.weight": 1, "other": 2}
    out = strip_prefix(sd, "net.")
    assert out == {"dncnn.0.weight": 1, "other": 2}


def test_pack_raw_bayer():
    from frame2frame_tpu.data.datasets import pack_raw_bayer

    raw = np.arange(16).reshape(1, 4, 4)
    packed = pack_raw_bayer(raw)
    assert packed.shape == (1, 2, 2, 4)
    # RGGB plane order: R=(0,0), G1=(0,1), G2=(1,0), B=(1,1)
    np.testing.assert_array_equal(packed[0, 0, 0], [0, 1, 4, 5])


def test_strred_published_structure():
    """ST-RRED (utils/metrics.py): faithful Soundararajan-Bovik structure —
    steerable-pyramid subband + GSM block entropies + entropic differencing
    (reference surface: test.py:25,245-252). Properties: zero at identity,
    strictly monotonic in noise level, TWO independent band implementations
    (downsampling spatial pyramid — the skvideo structure — and the
    analytic frequency-domain band) agreeing on distortion ranking, pinned
    regression values for both. skvideo's exact numbers are unobtainable
    offline (sp5Filters tables); scripts/validate_strred.py records the
    deltas when run on an skvideo-equipped host."""
    import numpy as np
    from scipy.ndimage import gaussian_filter

    from frame2frame_tpu.utils.metrics import compute_strred

    rng = np.random.default_rng(0)
    base = gaussian_filter(rng.random((144, 176)), 3.0)
    base = (base - base.min()) / (base.max() - base.min()) * 255
    clean = np.stack([np.roll(base, t, axis=1) for t in range(5)])[..., None]

    assert np.allclose(compute_strred(clean, clean), 0.0)
    assert np.allclose(compute_strred(clean, clean, method="analytic"), 0.0)

    vals_s, vals_a = [], []
    for sigma in (5, 15, 30, 50):
        noisy = clean + rng.normal(0, sigma, clean.shape)
        vals_s.append(float(np.mean(compute_strred(clean, noisy))))
        vals_a.append(float(np.mean(compute_strred(clean, noisy,
                                                   method="analytic"))))
    # both implementations monotonic in distortion, i.e. identical ranking
    assert vals_s == sorted(vals_s), vals_s
    assert vals_a == sorted(vals_a), vals_a

    # pinned regression values (fixed seed)
    np.testing.assert_allclose(
        vals_s, [0.245416, 1.963984, 10.799352, 34.418019], rtol=1e-3)
    np.testing.assert_allclose(
        vals_a, [0.059206, 0.575836, 3.634487, 11.709422], rtol=1e-3)

    # single-frame videos: spatial-only path
    one = compute_strred(clean[:1], clean[:1] + rng.normal(0, 10, clean[:1].shape))
    assert one.shape == (1,) and one[0] > 0


def test_dir_dataset_read_flows(tmp_path):
    """Dir-backed datasets supply fflow/bflow when read_flows is set
    (reference datasets carry these fields, lightning.py:299-301), with .flo
    sidecar caching, and the eval pipeline consumes them end-to-end
    (test.py:157-162)."""
    import numpy as np
    from scipy.ndimage import gaussian_filter

    from frame2frame_tpu.config import Config
    from frame2frame_tpu.data import sets
    from frame2frame_tpu.io.image import write_gray

    rng = np.random.default_rng(3)
    base = gaussian_filter(rng.random((40, 48)), 3.0)
    base = (base - base.min()) / (base.max() - base.min()) * 255
    vdir = tmp_path / "data" / "set8" / "vid00"
    vdir.mkdir(parents=True)
    for t in range(4):
        write_gray(str(vdir / f"{t:03d}.png"), np.roll(base, t, axis=1)[:32, :32])

    cfg = Config({"dname": "set8", "data_root": str(tmp_path / "data"),
                  "ntype": "g", "sigma": 15, "read_flows": True})
    data, loaders = sets.load(cfg)
    sample = data.te[0]
    assert sample.fflow.shape == (4, 32, 32, 2)
    assert sample.bflow.shape == (4, 32, 32, 2)
    # horizontal roll of 1 px/frame: median fflow x-component ~ +/-1
    assert abs(abs(float(np.median(sample.fflow[1][..., 0]))) - 1.0) < 0.5

    # sidecar cache written and reused
    flo_files = list((vdir / ".flows").glob("*.flo"))
    assert len(flo_files) == 8
    data2, _ = sets.load(cfg)
    s2 = data2.te[0]
    np.testing.assert_allclose(s2.fflow, sample.fflow)

    # eval pipeline consumes dataset flows (read_flows path, test.py:157-162)
    from frame2frame_tpu.eval import test as eval_test

    res = eval_test.run(Config({
        "dname": "set8", "data_root": str(tmp_path / "data"),
        "ntype": "g", "sigma": 15, "read_flows": True, "flow": True,
        "net_name": "dncnn", "channels": 1, "num_layers": 3,
        "vid_name": "vid00", "frame_start": 0, "frame_end": 3,
        "save_deno": False,
    }))
    assert np.isfinite(res.psnrs[0]).all()


def test_instances_adapt_raw_and_sigma_table(tmp_path):
    """instances_adapt parity pieces (reference instances_adapt.py:79-158,
    348-379): raw mosaic burst decode via tifffile + Bayer packing +
    black/white-level normalization, optional Anscombe stabilization, and the
    sigma -> pretrained-checkpoint table."""
    import json

    import numpy as np
    from PIL import Image

    import scripts.instances_adapt as ia
    from frame2frame_tpu.config import Config

    # raw burst: 3 mosaic frames as .tiff files
    rng = np.random.default_rng(0)
    braw = tmp_path / "burst"
    braw.mkdir()
    mosaics = (rng.random((3, 16, 20)) * 4000 + 512).astype(np.float32)
    for t in range(3):
        Image.fromarray(mosaics[t], mode="F").save(
            str(braw / f"frame_{t:02d}.tiff"))

    cfg = Config({"raw_path": str(braw), "raw_black_level": 512,
                  "raw_white_level": 4608})
    vid = ia.load_raw_burst(cfg)
    assert vid.shape == (3, 8, 10, 4)
    assert 0.0 <= vid.min() and vid.max() <= 1.0
    # packing layout: RGGB planes
    expect = (mosaics[0, 0, 0] - 512) / 4096
    np.testing.assert_allclose(vid[0, 0, 0, 0], expect, rtol=1e-5)

    # Anscombe gate changes values monotonically, keeps [0, 1]
    cfg2 = Config(dict(cfg, use_anscombe=True))
    vid2 = ia.load_raw_burst(cfg2)
    assert vid2.shape == vid.shape and vid2.max() <= 1.0 + 1e-6
    assert not np.allclose(vid, vid2)

    # sigma -> checkpoint table
    ck = tmp_path / "ckpts"
    ck.mkdir()
    (ck / "x.msgpack").write_bytes(b"")
    (ck / "sigma_table.json").write_text(
        json.dumps({"dncnn": {"25": "x.msgpack"}}))
    cfg3 = Config({"pretrained_root": str(ck), "net_name": "dncnn",
                   "sigma": 25})
    ia.set_pretrained_path(cfg3)
    assert cfg3["pretrained_path"].endswith("x.msgpack")
    assert cfg3["pretrained_load"]

    # filename-convention fallback
    (ck / "dncnn-sigma30.msgpack").write_bytes(b"")
    cfg4 = Config({"pretrained_root": str(ck), "net_name": "dncnn",
                   "sigma": 30})
    ia.set_pretrained_path(cfg4)
    assert cfg4["pretrained_path"].endswith("dncnn-sigma30.msgpack")


def test_torch_sgd_momentum_parity():
    """sgd_momentum/sgd_dampening config keys drive exact torch.optim.SGD
    semantics, including the undampened first-step buffer (lit_pairs keys,
    lightning.py:169-181)."""
    import numpy as np
    import torch

    import jax.numpy as jnp
    import optax

    from frame2frame_tpu.train.schedules import scale_by_torch_sgd_momentum

    momentum, dampening, lr = 0.9, 0.3, 0.1
    w0 = np.asarray([1.0, -2.0, 3.0], np.float32)
    grads = [np.asarray(g, np.float32) for g in
             ([0.5, -1.0, 2.0], [1.0, 1.0, -1.0], [-0.2, 0.3, 0.4])]

    wt = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.SGD([wt], lr=lr, momentum=momentum, dampening=dampening)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.tensor(g)
        opt.step()

    tx = optax.chain(scale_by_torch_sgd_momentum(momentum, dampening),
                     optax.scale(-lr))
    wj = jnp.asarray(w0)
    st = tx.init(wj)
    for g in grads:
        upd, st = tx.update(jnp.asarray(g), st, wj)
        wj = optax.apply_updates(wj, upd)

    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(),
                               rtol=1e-6, atol=1e-7)


def test_temporal_chunk_overlap():
    """temporal_chunk_overlap is honored: overlapping temporal tiles blend by
    averaging (reference chunk surface, test.py:53-57)."""
    import numpy as np

    from frame2frame_tpu.config import Config
    from frame2frame_tpu.eval.chunks import chunk

    calls = []

    def fwd(vid, fl=None):
        calls.append(vid.shape[1])
        return vid * 2.0

    f = chunk(Config({"temporal_chunk_size": 4, "temporal_chunk_overlap": 2}),
              fwd)
    vid = np.random.default_rng(0).random((1, 8, 4, 4, 1)).astype(np.float32)
    out = np.asarray(f(vid))
    np.testing.assert_allclose(out, vid * 2.0, rtol=1e-6)
    # stride = 4 - 2 = 2 -> starts 0,2,4 (and 4 == T-4 already covered)
    assert len(calls) == 3 and all(c == 4 for c in calls)


def test_run_exps_dispatch_and_wandb(tmp_path):
    """cache.run_exps honors enable_dispatch (subprocess-per-experiment with
    cross-job skip-done; slurm backend falls back to the pool without sbatch)
    and use_wandb (local wandb-compatible JSONL logs) — the reference launch
    surface cache_io.run_exps(..., enable_dispatch="slurm", use_wandb=True)
    (scripts/trte_dncnn/train.py:42-45, instances_adapt.py:512-516)."""
    import json
    import sys

    from frame2frame_tpu import cache

    (tmp_path / "dispatch_target.py").write_text(
        "import os\n"
        "def run(cfg):\n"
        "    return {'value': cfg['x'] * 2, 'pid': os.getpid()}\n")
    sys.path.insert(0, str(tmp_path))
    try:
        from dispatch_target import run as run_fn

        exps = cache.load_edata({"a": 1}, [{"x": [1, 2, 3]}])
        recs = cache.run_exps(exps, run_fn, cache_dir=str(tmp_path),
                              proj_name="disp", enable_dispatch="process",
                              use_wandb=True, verbose=False,
                              dispatch_nprocs=2)
        assert sorted(r["results"]["value"] for r in recs) == [2, 4, 6]
        # each experiment really ran in its own interpreter
        import os as _os

        pids = {r["results"]["pid"] for r in recs}
        assert _os.getpid() not in pids

        # skip-done across a second dispatch invocation (sweep resume)
        recs2 = cache.run_exps(exps, run_fn, cache_dir=str(tmp_path),
                               proj_name="disp", enable_dispatch="slurm",
                               verbose=False)
        assert sorted(r["results"]["value"] for r in recs2) == [2, 4, 6]

        # local wandb-compatible logs written (one per run)
        logs = list((tmp_path / "wandb" / "disp").glob("*.jsonl"))
        assert len(logs) == 3
        lines = [json.loads(ln) for ln in logs[0].read_text().splitlines()]
        assert lines[0]["event"] == "init" and lines[1]["event"] == "summary"
    finally:
        sys.path.remove(str(tmp_path))


def test_profiling_helpers(tmp_path):
    """trace_if captures a device trace; memory profile writes pprof bytes."""
    import jax.numpy as jnp

    from frame2frame_tpu.utils.profiling import (
        annotate,
        peak_device_memory_mb,
        trace_if,
        write_memory_profile,
    )

    # no-op path
    with trace_if(""):
        pass
    tdir = tmp_path / "trace"
    with trace_if(str(tdir)):
        with annotate("stage"):
            jnp.sum(jnp.ones((64, 64))).block_until_ready()
    assert any(tdir.rglob("*.trace.json.gz")), "no trace captured"
    p = write_memory_profile(str(tmp_path / "mem.pprof"))
    assert (tmp_path / "mem.pprof").stat().st_size > 0
    peak_device_memory_mb()  # smoke: must not raise


# ------------------------------------------------------- round-3 fidelity --


def test_msg_dataset_sigma_is_drawn_value():
    """The sample's ``sigma`` must be the per-sample DRAWN value (one per
    video), and the dd_in=4 sigma-map channel must match the noise actually
    applied (reference lightning.py:129-141). Regression for the round-2
    verdict's msg sigma-map bug."""
    from frame2frame_tpu.data import sets
    from frame2frame_tpu.train.lit import TrainModule
    from frame2frame_tpu.models.dncnn import init_dncnn

    cfg = Config(dname="synthetic", nvideos=4, nframes_data=4,
                 isize_data=(32, 32), ntype="msg", sigma_min=10, sigma_max=60)
    data, _ = sets.load(cfg)
    sigmas = []
    for i in range(len(data.tr)):
        s = data.tr[i]
        # drawn sigma, not the range mean
        assert 10.0 <= s.sigma <= 60.0
        sigmas.append(s.sigma)
        # the drawn value matches the corruption actually applied
        resid = (s.noisy - s.clean).std()
        np.testing.assert_allclose(resid, s.sigma, rtol=0.15)
    assert np.std(sigmas) > 0.0, "sigma never varies: still the range mean"

    # the sigma-map channel carries the same drawn value
    model, _ = init_dncnn(jax.random.PRNGKey(0), channels=1, num_layers=4,
                          spatial=(16, 16))
    mcfg = Config(crit_name="sup", ntype="msg", sigma_min=10, sigma_max=60,
                  dd_in=2, flow=False)
    module = TrainModule(mcfg, model, residual=True)
    s0 = data.tr[0]
    noisy = jnp.asarray(s0.noisy)[None] / 255.0
    out = module.ensure_chnls(noisy, s0.sigma)
    np.testing.assert_allclose(np.asarray(out[..., -1]), s0.sigma / 255.0,
                               rtol=1e-6)


def test_flow_epoch_gating(tiny_model):
    """flow_from_end=N turns flow on for the last N epochs (reference
    set_flow_epoch, lightning.py:118,157-161)."""
    from frame2frame_tpu.train.lit import TrainModule

    model, _ = tiny_model
    cfg = Config(crit_name="sup", flow=False, nepochs=5, flow_from_end=2,
                 ntype="g", sigma=25)
    module = TrainModule(cfg, model, residual=True)
    assert module.cfg.flow_epoch == 3
    assert [module.use_flow(e) for e in range(5)] == [
        False, False, False, True, True]

    # explicit flow_epoch wins over flow_from_end
    cfg2 = Config(crit_name="sup", flow=False, nepochs=5, flow_epoch=1,
                  flow_from_end=4, ntype="g", sigma=25)
    module2 = TrainModule(cfg2, model, residual=True)
    assert module2.cfg.flow_epoch == 1
    assert module2.use_flow(0) is False and module2.use_flow(1) is True

    # flow=True stays on everywhere
    cfg3 = Config(crit_name="sup", flow=True, nepochs=5, flow_from_end=2,
                  ntype="g", sigma=25)
    module3 = TrainModule(cfg3, model, residual=True)
    assert all(module3.use_flow(e) for e in range(5))


def test_adapt_nsteps_caps_updates(tiny_model):
    """internal_adapt_nsteps bounds the optimizer steps per adaptation epoch
    (reference threads nsteps into run_internal_adapt, test.py:189-203)."""
    from frame2frame_tpu import get_loss_fxn
    from frame2frame_tpu.train.schedules import make_optimizer
    from frame2frame_tpu.train.state import TrainState

    model, variables = tiny_model
    cfg = Config(loss_type="f2f", adapt_isize="16_16", adapt_nepochs=2,
                 nbatch_sample=1, flow=False, adapt_nsteps=1)
    loss_fxn = get_loss_fxn(cfg, "f2f")
    tx, _ = make_optimizer(Config(scheduler_name="none", lr_init=1e-4,
                                  nepochs=1))
    state = TrainState.create(model, variables, tx, residual=True)
    rng = np.random.default_rng(3)
    noisy = rng.random((1, 8, 24, 24, 1)).astype(np.float32)
    state2, info = loss_fxn(state, noisy, noisy.copy())
    # 4 windows/epoch uncapped -> capped to 1 step x 2 epochs
    assert len(info.loss) == 2
    assert state2.step == 2


def test_async_flow_solver_matches_direct():
    """AsyncFlowSolver (background CPU thread + async device_put) returns
    bitwise the same flows as the direct solver call — the overlap changes
    scheduling, never values."""
    from frame2frame_tpu.flow.tvl1 import DENOISING_PARAMS, make_tvl1_solver
    from frame2frame_tpu.train.online import AsyncFlowSolver, _want_async_flow

    H = W = 48
    rng = np.random.default_rng(0)
    frames = [rng.random((H, W, 1)).astype(np.float32) for _ in range(4)]

    direct = make_tvl1_solver(W, H, **DENOISING_PARAMS)
    solver = AsyncFlowSolver(W, H, dict(DENOISING_PARAMS), lookahead=2)
    try:
        for i in range(1, 4):
            solver.prefetch(i, frames[i], frames[i - 1])
        for i in range(1, 4):
            got = np.asarray(solver.get(i))
            want = np.asarray(direct(
                jnp.asarray(frames[i][..., 0] * 255.0),
                jnp.asarray(frames[i - 1][..., 0] * 255.0)))
            np.testing.assert_array_equal(got, want)
    finally:
        solver.close()

    # mode resolution: explicit cpu forces on, off/tpu force off; auto is
    # off on the CPU test backend (no TPU to overlap against)
    assert _want_async_flow("cpu") is True
    assert _want_async_flow("off") is False
    assert _want_async_flow("tpu") is False
    assert _want_async_flow("auto") is False


def test_learned_noise_sim_exercises_sample_noisy(tiny_model):
    """The learned-simulator path (reference 'stardeno' hook,
    lightning.py:102-109,151-155) works end-to-end: a substitute simulator
    loads when the external module is missing, resamples batch['noisy'] in
    sample_noisy, and its MLE fit recovers a known noise law."""
    from frame2frame_tpu.models.noise_sim import HeteroscedasticGaussianSim
    from frame2frame_tpu.train.lit import TrainModule
    from frame2frame_tpu.train.schedules import make_optimizer
    from frame2frame_tpu.train.state import TrainState

    # fit recovers sigma(x) = softplus(a + b x) from samples
    rng = np.random.default_rng(0)
    clean = rng.uniform(0, 255, (2, 2, 32, 32, 1)).astype(np.float32)
    true = HeteroscedasticGaussianSim(channels=1, a=3.0, b=0.005)
    noisy = np.asarray(true.run_rgb(clean, jax.random.PRNGKey(0)))
    fit = HeteroscedasticGaussianSim(channels=1, a=1.0, b=0.0)
    fit.fit(clean, noisy, steps=300)
    s_true = np.asarray(true.sigma(jnp.asarray(clean))).mean()
    s_fit = np.asarray(fit.sigma(jnp.asarray(clean))).mean()
    np.testing.assert_allclose(s_fit, s_true, rtol=0.1)

    # sim_type='stardeno' with the module absent -> substitute simulator;
    # sample_noisy really replaces the batch noise
    model, variables = tiny_model
    cfg = Config(crit_name="sup", ntype="g", sigma=25, flow=False,
                 sim_type="stardeno", sim_channels=1, nepochs=1)
    module = TrainModule(cfg, model, residual=True)
    assert module.sim_model is not None
    batch = Config(noisy=clean + 999.0, clean=clean)
    out = module.sample_noisy(batch, jax.random.PRNGKey(1))
    resampled = np.asarray(out["noisy"])
    assert np.abs(resampled - clean).max() < 500  # the 999 offset is gone
    assert np.abs(resampled - clean).std() > 0.1  # and real noise was added

    tx, _ = make_optimizer(Config(module.cfg, lr_init=1e-3))
    state = TrainState.create(model, variables, tx, residual=True)
    state2, metrics = module.training_step(state, batch, epoch=0,
                                           key=jax.random.PRNGKey(2))
    assert np.isfinite(metrics.train_loss)


def test_jitted_step_matches_eager(tiny_model):
    """The jitted offline step (TrainModule._build_jit_step) must reproduce
    the eager fallback path bit-for-bit given the same inputs, and must reuse
    the compiled program while the schedule-resolved key is unchanged."""
    from frame2frame_tpu.train.lit import TrainModule
    from frame2frame_tpu.train.schedules import make_optimizer
    from frame2frame_tpu.train.state import TrainState

    model, variables = tiny_model
    cfg = Config(crit_name="warped", nepochs=2, lr_init=1e-3, ntype="g",
                 sigma=25, flow=False, wt=1, rate=-1)
    rng = np.random.default_rng(3)
    clean = rng.random((1, 3, 16, 16, 1)).astype(np.float32) * 255
    batch = Config(noisy=(clean + rng.normal(0, 25, clean.shape)).astype(
        np.float32), clean=clean)
    key = jax.random.PRNGKey(7)

    # jitted path (default)
    module = TrainModule(cfg, model, residual=True)
    tx, _ = make_optimizer(module.cfg)
    state = TrainState.create(model, variables, tx, residual=True)
    assert module._jit_step_key(state, 0, 0) is not None
    state_j, m_j = module.training_step(state, batch, epoch=0, key=key)
    fn0 = module._jit_fn
    state_j2, _ = module.training_step(state_j, batch, epoch=0, key=key)
    assert module._jit_fn is fn0  # same resolved key -> program reused

    # eager path (force by clearing support), fresh module + state
    module_e = TrainModule(cfg, model, residual=True)
    module_e._jit_step_key = lambda *_: None
    state_e = TrainState.create(model, variables, tx, residual=True)
    state_e, m_e = module_e.training_step(state_e, batch, epoch=0, key=key)

    np.testing.assert_allclose(m_j.train_loss, m_e.train_loss, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(state_j.params),
                    jax.tree.leaves(state_e.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # the step-smooth stnls config must refuse to jit
    cfg_i = Config(crit_name="stnls", nepochs=2, search_input="interp",
                   ntype="g", sigma=25, flow=False)
    module_i = TrainModule(cfg_i, model, residual=True)
    assert module_i._jit_step_key(state, 0, 0) is None


def test_sim_model_unknown_module_raises(tiny_model):
    """get_sim_model substitutes the built-in simulator ONLY for the known
    non-distributable 'stardeno' module; a user-specified sim_module that
    fails to import must raise, not silently swap in toy noise."""
    import pytest as _pytest

    from frame2frame_tpu.train.lit import get_sim_model

    with _pytest.raises(ImportError):
        get_sim_model(Config(sim_type="totally_missing_simulator_pkg",
                             sim_channels=1))
    # the stardeno fallback still substitutes
    assert get_sim_model(Config(sim_type="stardeno", sim_channels=1)) is not None


def test_wandb_upgrade_removes_local_jsonl(tmp_path, monkeypatch):
    """A run first captured by the local JSONL fallback is upgraded to wandb
    on a later re-walk AND its fallback record is dropped, so cross-sink
    aggregation never counts the run twice."""
    import sys
    import types

    from frame2frame_tpu.cache import _wandb_log

    state = {}
    # first pass: no wandb importable -> local JSONL + marker 'local'
    monkeypatch.setitem(sys.modules, "wandb", None)  # import wandb -> ImportError
    _wandb_log(state, str(tmp_path), "proj", "u1", {"a": 1}, {"psnr": 30.0})
    local = tmp_path / "wandb" / "proj" / "u1.jsonl"
    marker = tmp_path / "wandb_logged" / "proj.u1"
    assert local.exists() and marker.read_text() == "local"

    # second pass: a working wandb appears -> upgrade + local record removed
    calls = {}

    class _Run:
        summary = types.SimpleNamespace(update=lambda *_a, **_k: None)

        def finish(self):
            calls["finished"] = True

    fake = types.SimpleNamespace(init=lambda **kw: _Run())
    monkeypatch.setitem(sys.modules, "wandb", fake)
    _wandb_log(state, str(tmp_path), "proj", "u1", {"a": 1}, {"psnr": 30.0})
    assert calls.get("finished") and marker.read_text() == "wandb"
    assert not local.exists()

    # third pass: marker 'wandb' short-circuits (no duplicate runs)
    fake2 = types.SimpleNamespace(
        init=lambda **kw: (_ for _ in ()).throw(AssertionError("re-logged")))
    monkeypatch.setitem(sys.modules, "wandb", fake2)
    _wandb_log(state, str(tmp_path), "proj", "u1", {"a": 1}, {"psnr": 30.0})
