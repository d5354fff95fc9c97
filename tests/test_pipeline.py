"""End-to-end pipeline test: scene build -> trainer -> checkpoints -> export.

Runs a 3-frame synthetic sequence through the FULL orchestration
(init + tracking phases, constraints, warm starts, resume, export) at tiny
scale on CPU — BASELINE config 3's shape (frame-by-frame warm-started
tracking).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topo4d_tpu.config import Config
from topo4d_tpu.pipeline.checkpoint import load_params, load_resume
from topo4d_tpu.pipeline.data import SyntheticSequence, view_order
from topo4d_tpu.pipeline.scene import build_scene
from topo4d_tpu.pipeline.trainer import Trainer
from topo4d_tpu.testing import (
    make_camera_ring,
    make_grid_mesh,
    make_synthetic_regions,
)
from topo4d_tpu.topology.obj_io import MeshObj


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    rows = cols = 10
    verts, faces = make_grid_mesh(rows, cols, extent=0.5)
    n = verts.shape[0]
    uvs = np.stack(
        np.meshgrid(
            np.linspace(0.05, 0.95, cols), np.linspace(0.05, 0.95, rows),
            indexing="xy",
        ),
        -1,
    ).reshape(-1, 2).astype(np.float32)
    mesh = MeshObj(
        vertices=verts, uvs=uvs, faces=faces,
        uv_faces=[list(f) for f in faces],
    )
    regions = make_synthetic_regions(n, faces)

    cfg = Config()
    cfg.data.output_dir = str(tmp_path_factory.mktemp("out"))
    cfg.data.use_mask = False
    cfg.schedule.frame_num = 3
    cfg.schedule.init_opt_num = 12
    cfg.schedule.opt_num = 8
    cfg.schedule.polish_iters = 2
    cfg.schedule.log_freq = 4
    cfg.schedule.ckp_freq = 1
    cfg.schedule.dense_opt_num = 4
    cfg.schedule.dense_log_freq = 2
    cfg.raster.backend = "tiled"
    cfg.raster.capacity = 256
    cfg.texture.gen_tex = True
    cfg.texture.density = 2
    cfg.texture.tex_res = 64
    cfg.texture.bake_window = 16
    cfg.texture.bake_bands = 2

    params, statics = build_scene(mesh, regions, cfg, num_views=4)
    cams = make_camera_ring(4, width=48, height=32, distance=2.0)
    source = SyntheticSequence(params=params, cameras=cams, num_frames=3)
    trainer = Trainer(cfg, source, params, statics)
    trainer.run(resume=False)
    return cfg, trainer, statics


def test_pipeline_produces_outputs(tiny_setup):
    cfg, trainer, statics = tiny_setup
    out = os.path.join(cfg.data.output_dir, cfg.data.exp, cfg.data.seq)
    # per-frame OBJ exports with the ORIGINAL topology
    for t in (1, 2, 3):
        path = os.path.join(out, "%06d" % t, "face.obj")
        assert os.path.exists(path), path
    # texture baked
    assert os.path.exists(os.path.join(out, "000001", "face.png"))
    # params.npz with delta compression
    p = load_params(os.path.join(out, "params.npz"))
    assert p["means3D"].ndim == 3  # stacked over frames
    assert p["cam_m"].ndim == 2  # frame-0 only key not stacked
    # resume checkpoint exists and points past the last frame
    payload = load_resume(out)
    assert payload["frame"] == 3
    # metrics logged
    lines = open(os.path.join(out, "metrics.jsonl")).read().splitlines()
    assert len(lines) > 3
    row = json.loads(lines[0])
    assert np.isfinite(row["loss_total"])
    # per-frame summary rows carry throughput counters
    summaries = [
        json.loads(l) for l in lines if json.loads(l).get("summary")
    ]
    assert len(summaries) == 3
    assert all(s["mpix_per_s"] > 0 for s in summaries)
    # phase timings written by the profiling subsystem
    timings = json.load(open(os.path.join(out, "timings.json")))
    for phase in ("geometry", "texture", "checkpoint", "export"):
        assert timings[phase]["count"] == 3, phase
        assert timings[phase]["seconds"] > 0


def test_topology_bitwise_stable_across_frames(tiny_setup):
    cfg, trainer, statics = tiny_setup
    out = os.path.join(cfg.data.output_dir, cfg.data.exp, cfg.data.seq)

    def read_topology(path):
        faces = [l for l in open(path) if l.startswith("f ")]
        return "".join(faces)

    t1 = read_topology(os.path.join(out, "000001", "face.obj"))
    t2 = read_topology(os.path.join(out, "000002", "face.obj"))
    t3 = read_topology(os.path.join(out, "000003", "face.obj"))
    assert t1 == t2 == t3  # bitwise-stable topology (the whole point)


def test_static_region_pinned(tiny_setup):
    cfg, trainer, statics = tiny_setup
    static_idx = statics.regions.masks["static_masks"]
    np.testing.assert_allclose(
        np.asarray(trainer.state.params["means3D"])[static_idx],
        np.asarray(trainer.params0["means3D"])[static_idx],
        atol=1e-7,
    )


def test_constraint_values_applied(tiny_setup):
    cfg, trainer, statics = tiny_setup
    m = statics.regions.masks
    params = trainer.state.params
    # mouth-inner scales pinned to log(0.002) (train.py:681)
    np.testing.assert_allclose(
        np.asarray(params["log_scales"])[m["mouth_inner_masks"]],
        np.log(0.002),
        atol=1e-6,
    )
    # dynamic-mouth colors pinned to 0
    np.testing.assert_allclose(
        np.asarray(params["rgb_colors"])[m["dynamic_mouth_masks"]], 0.0,
        atol=1e-7,
    )


def test_resume_continues(tiny_setup, tmp_path):
    cfg, trainer, statics = tiny_setup
    # new trainer resuming from saved state should jump past all frames
    source = trainer.source
    params = {k: np.asarray(v) for k, v in trainer.params0.items()}
    t2 = Trainer(cfg, source, params, statics)
    t2.run(resume=True)  # frames already done -> no-op
    payload = load_resume(
        os.path.join(cfg.data.output_dir, cfg.data.exp, cfg.data.seq)
    )
    assert payload["frame"] == 3


def test_view_order_covers_all_views():
    order = view_order(4, 10, seed=0)
    assert order.shape == (10,)
    # each epoch of 4 is a permutation
    assert set(order[:4].tolist()) == {0, 1, 2, 3}
    assert set(order[4:8].tolist()) == {0, 1, 2, 3}


def test_cli_config_wiring():
    from topo4d_tpu.cli import build_argparser, config_from_args

    args = build_argparser().parse_args(
        ["-e", "expX", "-s", "seqY", "-fn", "10", "--gen_tex", "-tr", "512",
         "--backend", "tiled", "--views_per_step", "0"]
    )
    cfg = config_from_args(args)
    assert cfg.data.exp == "expX" and cfg.data.seq == "seqY"
    assert cfg.schedule.frame_num == 10
    assert cfg.texture.gen_tex and cfg.texture.tex_res == 512
    assert cfg.raster.backend == "tiled"
    assert cfg.schedule.views_per_step == 0
    # config JSON roundtrip
    from topo4d_tpu.config import Config

    cfg2 = Config.from_json(cfg.to_json())
    assert cfg2.texture.tex_res == 512
    assert cfg2.weights.rigid == cfg.weights.rigid


def test_scanned_segments_match_per_iteration_loop(tmp_path):
    """use_scan=True must reproduce the per-iteration dispatch exactly."""
    import copy

    rows = cols = 8
    verts, faces = make_grid_mesh(rows, cols, extent=0.5)
    n = verts.shape[0]
    uvs = np.stack(
        np.meshgrid(
            np.linspace(0.05, 0.95, cols), np.linspace(0.05, 0.95, rows),
            indexing="xy",
        ),
        -1,
    ).reshape(-1, 2).astype(np.float32)
    mesh = MeshObj(
        vertices=verts, uvs=uvs, faces=faces,
        uv_faces=[list(f) for f in faces],
    )
    regions = make_synthetic_regions(n, faces)

    results = {}
    for use_scan in (False, True):
        cfg = Config()
        cfg.data.output_dir = str(tmp_path / f"scan_{use_scan}")
        cfg.data.use_mask = False
        cfg.schedule.frame_num = 2
        cfg.schedule.init_opt_num = 9
        cfg.schedule.opt_num = 7
        cfg.schedule.polish_iters = 2
        cfg.schedule.log_freq = 4
        cfg.schedule.ckp_freq = 1
        cfg.schedule.use_scan = use_scan
        cfg.raster.backend = "tiled"
        cfg.raster.capacity = 256
        cfg.texture.gen_tex = False

        params, statics = build_scene(mesh, regions, cfg, num_views=3)
        cams = make_camera_ring(3, width=32, height=24, distance=2.0)
        source = SyntheticSequence(
            params=copy.deepcopy(params), cameras=cams, num_frames=2
        )
        trainer = Trainer(cfg, source, params, statics)
        assert (trainer.multi_step is not None) == use_scan
        trainer.run(resume=False)
        results[use_scan] = jax.tree_util.tree_map(
            np.asarray, trainer.state.params
        )

    for k in results[False]:
        np.testing.assert_allclose(
            results[True][k], results[False][k], rtol=1e-6, atol=1e-7,
            err_msg=k,
        )


def test_resume_mid_sequence_with_texture(tmp_path):
    """A restored texture_state must still get its (re)built step fns."""
    rows = cols = 8
    verts, faces = make_grid_mesh(rows, cols, extent=0.5)
    n = verts.shape[0]
    uvs = np.stack(
        np.meshgrid(
            np.linspace(0.05, 0.95, cols), np.linspace(0.05, 0.95, rows),
            indexing="xy",
        ),
        -1,
    ).reshape(-1, 2).astype(np.float32)
    mesh = MeshObj(
        vertices=verts, uvs=uvs, faces=faces,
        uv_faces=[list(f) for f in faces],
    )
    regions = make_synthetic_regions(n, faces)

    cfg = Config()
    cfg.data.output_dir = str(tmp_path / "out")
    cfg.data.use_mask = False
    cfg.schedule.frame_num = 1
    cfg.schedule.init_opt_num = 6
    cfg.schedule.opt_num = 5
    cfg.schedule.polish_iters = 1
    cfg.schedule.log_freq = 3
    cfg.schedule.ckp_freq = 1
    cfg.schedule.dense_opt_num = 3
    cfg.schedule.dense_log_freq = 2
    cfg.raster.backend = "tiled"
    cfg.raster.capacity = 256
    cfg.texture.gen_tex = True
    cfg.texture.density = 2
    cfg.texture.tex_res = 32
    cfg.texture.bake_window = 16
    cfg.texture.bake_bands = 2

    params, statics = build_scene(mesh, regions, cfg, num_views=3)
    cams = make_camera_ring(3, width=32, height=24, distance=2.0)
    source = SyntheticSequence(params=params, cameras=cams, num_frames=2)
    Trainer(cfg, source, params, statics).run(resume=False)

    # second run resumes past frame 1 and must fit frame 2's texture
    cfg.schedule.frame_num = 2
    params2, statics2 = build_scene(mesh, regions, cfg, num_views=3)
    t2 = Trainer(cfg, source, params2, statics2)
    t2.run(resume=True)
    out = os.path.join(cfg.data.output_dir, cfg.data.exp, cfg.data.seq)
    assert os.path.exists(os.path.join(out, "000002", "face.png"))
    assert load_resume(out)["frame"] == 2
    # resume must preserve the pre-resume frames' metrics history (the
    # log is rewritten whole each frame; r3 e2e caught it dropping them)
    import json as _json

    rows_log = [
        _json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))
    ]
    frames_logged = {r["frame"] for r in rows_log if r.get("summary")}
    assert frames_logged == {0, 1}, frames_logged


def test_batched_mode_trains_full_schedule(tmp_path):
    """views_per_step=0 runs a real contracted schedule, not one step."""
    rows = cols = 8
    verts, faces = make_grid_mesh(rows, cols, extent=0.5)
    n = verts.shape[0]
    uvs = np.stack(
        np.meshgrid(
            np.linspace(0.05, 0.95, cols), np.linspace(0.05, 0.95, rows),
            indexing="xy",
        ),
        -1,
    ).reshape(-1, 2).astype(np.float32)
    mesh = MeshObj(
        vertices=verts, uvs=uvs, faces=faces,
        uv_faces=[list(f) for f in faces],
    )
    regions = make_synthetic_regions(n, faces)

    cfg = Config()
    cfg.data.output_dir = str(tmp_path / "out")
    cfg.data.use_mask = False
    cfg.schedule.frame_num = 1
    cfg.schedule.init_opt_num = 12
    cfg.schedule.opt_num = 6
    cfg.schedule.polish_iters = 1
    cfg.schedule.log_freq = 4
    cfg.schedule.ckp_freq = 1
    cfg.schedule.views_per_step = 0
    cfg.raster.backend = "tiled"
    cfg.raster.capacity = 256
    cfg.texture.gen_tex = False

    params, statics = build_scene(mesh, regions, cfg, num_views=3)
    cams = make_camera_ring(3, width=32, height=24, distance=2.0)
    source = SyntheticSequence(params=params, cameras=cams, num_frames=1)
    trainer = Trainer(cfg, source, params, statics)
    trainer.run(resume=False)
    rows_logged = [
        r for r in trainer.metrics_log
        if "iter" in r and not r.get("summary")
    ]
    # auto schedule = ceil(12 / 3) = 4 batched init steps -> iters 0..3
    assert max(r["iter"] for r in rows_logged) == 3
    # the synthetic GT is rendered from the INITIAL params, so PSNR starts
    # near-infinite and settles as the scale losses act; a healthy fit
    # stays well above the 20 dB floor used elsewhere
    last = next(r for r in rows_logged if r["iter"] == 3)
    assert last["psnr"] > 20.0
    assert np.isfinite(last["loss_total"])


def test_batched_scanned_segments_with_frozen_binnings(
    tmp_path, monkeypatch
):
    """views_per_step=0 + use_scan + track_rebin_freq drives the scanned
    batched multi-step with per-segment frozen binnings through the full
    trainer (init + track phases). Single-device path: the view mesh is
    disabled (the test env exposes 8 virtual CPU devices)."""
    import topo4d_tpu.parallel.mesh as pmesh

    monkeypatch.setattr(pmesh, "make_view_mesh", lambda n: None)

    rows = cols = 8
    verts, faces = make_grid_mesh(rows, cols, extent=0.5)
    n = verts.shape[0]
    uvs = np.stack(
        np.meshgrid(
            np.linspace(0.05, 0.95, cols), np.linspace(0.05, 0.95, rows),
            indexing="xy",
        ),
        -1,
    ).reshape(-1, 2).astype(np.float32)
    mesh = MeshObj(
        vertices=verts, uvs=uvs, faces=faces,
        uv_faces=[list(f) for f in faces],
    )
    regions = make_synthetic_regions(n, faces)

    cfg = Config()
    cfg.data.output_dir = str(tmp_path / "out")
    cfg.data.use_mask = False
    cfg.schedule.frame_num = 2
    cfg.schedule.init_opt_num = 9
    cfg.schedule.opt_num = 6
    cfg.schedule.polish_iters = 1
    cfg.schedule.log_freq = 4
    cfg.schedule.ckp_freq = 1
    cfg.schedule.views_per_step = 0
    cfg.raster.backend = "pallas"
    cfg.raster.interpret = True
    cfg.raster.track_rebin_freq = 2
    cfg.texture.gen_tex = False

    params, statics = build_scene(mesh, regions, cfg, num_views=3)
    cams = make_camera_ring(3, width=32, height=24, distance=2.0)
    source = SyntheticSequence(params=params, cameras=cams, num_frames=2)
    trainer = Trainer(cfg, source, params, statics)
    assert trainer.batched_multi_step is not None
    assert trainer._binnings_fn is not None
    trainer.run(resume=False)
    rows_logged = [
        r for r in trainer.metrics_log
        if "iter" in r and not r.get("summary")
    ]
    assert rows_logged, "no metrics logged"
    assert all(np.isfinite(r["loss_total"]) for r in rows_logged)
    # both frames produced a final-step log row
    frames = {r["frame"] for r in rows_logged}
    assert frames == {0, 1}


def test_report_progress_writes_views(tmp_path):
    from topo4d_tpu.core.gaussian import activate_params
    from topo4d_tpu.pipeline.progress import report_progress
    from topo4d_tpu.rasterizer.tiled import render_gaussians_tiled
    from topo4d_tpu.testing import make_synthetic_scene

    params = {
        k: jnp.asarray(v) for k, v in make_synthetic_scene(n=50).items()
    }
    params["cam_m"] = jnp.zeros((2, 3))
    params["cam_c"] = jnp.zeros((2, 3))
    cams = make_camera_ring(2, width=32, height=24)
    render_fn = lambda rv, cam: render_gaussians_tiled(rv, cam, capacity=128)
    gt = jnp.zeros((2, 3, 24, 32))
    p = report_progress(
        params, render_fn, cams, gt, ["view00", "view01"], ["view01"],
        str(tmp_path), frame=1, iteration=7,
    )
    assert p is not None and np.isfinite(p)
    assert os.path.exists(
        os.path.join(str(tmp_path), "000001", "visview01_7.png")
    )


def test_config_file_not_clobbered_by_default_flags(tmp_path):
    """Unpassed CLI flags must not overwrite --config values."""
    from topo4d_tpu.cli import build_argparser, config_from_args
    from topo4d_tpu.config import Config

    cfg = Config()
    cfg.schedule.frame_num = 123
    cfg.texture.gen_tex = True
    cfg.texture.tex_res = 256
    cfg.raster.backend = "tiled"
    cfg.raster.interpret = True
    cfg.data.use_mask_dense = True
    path = tmp_path / "cfg.json"
    path.write_text(cfg.to_json())

    # only -s passed: everything else must come from the config file
    args = build_argparser().parse_args(
        ["--config", str(path), "-s", "seqZ"]
    )
    out = config_from_args(args)
    assert out.data.seq == "seqZ"
    assert out.schedule.frame_num == 123
    assert out.texture.gen_tex and out.texture.tex_res == 256
    assert out.raster.backend == "tiled" and out.raster.interpret
    # explicit flags still win over the config
    args2 = build_argparser().parse_args(
        ["--config", str(path), "-fn", "7", "--no_mask"]
    )
    out2 = config_from_args(args2)
    assert out2.schedule.frame_num == 7
    assert out2.data.use_mask is False and out2.data.use_mask_dense is False


def test_texture_auto_tile_capacity(tmp_path):
    """texture.tile_capacity = -1 (default): the trainer sizes the
    compact-tile capacity from the frame's exact binning occupancy
    (VERDICT r3 item 7) — compact blending default-on, zero overflow,
    and the same outputs as the uncapped path."""
    rows = cols = 8
    verts, faces = make_grid_mesh(rows, cols, extent=0.5)
    n = verts.shape[0]
    uvs = np.stack(
        np.meshgrid(
            np.linspace(0.05, 0.95, cols), np.linspace(0.05, 0.95, rows),
            indexing="xy",
        ),
        -1,
    ).reshape(-1, 2).astype(np.float32)
    mesh = MeshObj(
        vertices=verts, uvs=uvs, faces=faces,
        uv_faces=[list(f) for f in faces],
    )
    regions = make_synthetic_regions(n, faces)

    def run(cap):
        cfg = Config()
        cfg.data.output_dir = str(tmp_path / f"out_{cap}")
        cfg.data.use_mask = False
        cfg.schedule.frame_num = 1
        cfg.schedule.init_opt_num = 4
        cfg.schedule.opt_num = 3
        cfg.schedule.polish_iters = 1
        cfg.schedule.log_freq = 3
        cfg.schedule.dense_opt_num = 3
        cfg.schedule.dense_log_freq = 2
        cfg.raster.backend = "pallas"
        cfg.raster.interpret = True
        cfg.raster.max_span = 8
        cfg.texture.gen_tex = True
        cfg.texture.density = 2
        cfg.texture.tex_res = 32
        cfg.texture.bake_window = 16
        cfg.texture.bake_bands = 2
        cfg.texture.tile_capacity = cap
        params, statics = build_scene(mesh, regions, cfg, num_views=2)
        cams = make_camera_ring(2, width=384, height=192, distance=2.0)
        source = SyntheticSequence(
            params=params, cameras=cams, num_frames=1
        )
        tr = Trainer(cfg, source, params, statics)
        tr.run(resume=False)
        return tr

    assert Config().texture.tile_capacity == -1  # auto is the default
    tr_auto = run(-1)
    tr_off = run(0)
    # auto sized a real capacity BELOW the canvas (384x192 -> 288
    # tiles), so compact-mode blending actually engaged
    assert 0 < tr_auto._auto_tile_cap < 288
    tex_rows = [
        r for r in tr_auto.metrics_log if "tex_num_tile_overflow" in r
    ]
    assert tex_rows and all(
        r["tex_num_tile_overflow"] == 0 for r in tex_rows
    )
    # same texture optimization results as the uncapped path
    np.testing.assert_allclose(
        np.asarray(tr_auto.texture_state.params["dense_rgb_colors"]),
        np.asarray(tr_off.texture_state.params["dense_rgb_colors"]),
        rtol=1e-6, atol=1e-7,
    )
