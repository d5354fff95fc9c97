"""Run configuration: every hard-coded table of the reference as data.

The reference buries its scientific payload in code — per-camera rotations
(train.py:28-35), loss weights (train.py:535-543), LR schedules
(train.py:272-297, 606-616, 705-711), per-region multipliers
(train.py:546-585), face-parsing labels (train.py:50-55). Here they are a
single dataclass tree (SURVEY §5): serializable, overridable from the CLI,
and saved next to checkpoints.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, List, Optional, Tuple

from topo4d_tpu.topology.regions import (
    ISO_REGION_MULTIPLIERS,
    RIGID_REGION_MULTIPLIERS,
    ROT_REGION_MULTIPLIERS,
)

# Per-camera +/-90-degree rotation of the input views (reference
# train.py:28-35): -1 clockwise, +1 anticlockwise.
DEFAULT_ROTATE_MASK: Dict[str, int] = {
    "J87351627": -1, "K19210959": -1, "K98707288": 1, "K98707289": 1,
    "K98707290": -1, "K98707291": 1, "K98707292": -1, "K98707293": -1,
    "K98707294": -1, "K98707295": -1, "K98707296": 1, "K98707297": -1,
    "K99216880": -1, "K99216881": -1, "K99216882": 1, "K99216883": 1,
    "K99216885": 1, "K99216886": -1, "K99216887": 1, "K99216888": 1,
    "K99216890": -1, "K99216891": -1, "K99216892": 1, "K99216893": 1,
}

# Face-parsing label colormap indices (reference train.py:50-55).
DEFAULT_CMAP_INDEX: Dict[str, int] = {
    "background": 0, "skin": 1, "l_eyebrow": 2, "r_eyebrow": 3,
    "l_eye": 4, "r_eye": 5, "nose": 6, "upper_lip": 7,
    "inner_mouth": 8, "lower_lip": 9, "hair": 10, "l_ear": 11,
    "r_ear": 12, "glasses": 13,
}


@dataclasses.dataclass
class LossWeights:
    """Global loss weights (reference train.py:535-543)."""

    im: float = 1.0
    rigid: float = 3.5
    rot: float = 20.0
    iso: float = 20.0
    flat: float = 2e-4
    flat_lip_bottom: float = 2e-4
    flat_lid_top: float = 2e-4
    flat_lid_bottom: float = 1e-2
    flat_lip: float = 1e-4
    flat_mouth: float = 1e-3
    flat_eye: float = 1e4
    flat_face_bottom: float = 1e3
    flat_lip_socket: float = 1e3
    scale: float = 10.0
    scale_max: float = 10.0

    def as_dict(self) -> Dict[str, float]:
        return dataclasses.asdict(self)


@dataclasses.dataclass
class DenseLossWeights:
    """Texture-phase weights (reference train.py:541-543)."""

    im: float = 1.0
    soft_color: float = 0.02

    def as_dict(self) -> Dict[str, float]:
        return dataclasses.asdict(self)


@dataclasses.dataclass
class LearningRates:
    """Per-parameter Adam LRs for the three phases.

    init: frame 0 (train.py:272-297); track: frames > 0 (train.py:606-616);
    polish: last 100 iterations of tracking (train.py:705-711).
    """

    init: Dict[str, float] = dataclasses.field(default_factory=lambda: {
        "means3D": 0.0, "rgb_colors": 2.5e-3, "unnorm_rotations": 1e-3,
        "logit_opacities": 0.0, "log_scales": 1e-3,
        "cam_m": 1e-4, "cam_c": 1e-4,
    })
    track: Dict[str, float] = dataclasses.field(default_factory=lambda: {
        "means3D": 1.6e-5, "rgb_colors": 0.0, "unnorm_rotations": 1e-3,
        "logit_opacities": 0.0, "log_scales": 0.0,
        "cam_m": 0.0, "cam_c": 0.0,
    })
    polish: Dict[str, float] = dataclasses.field(default_factory=lambda: {
        "means3D": 0.0, "rgb_colors": 2.5e-4, "unnorm_rotations": 1e-3,
        "logit_opacities": 0.0, "log_scales": 0.0,
        "cam_m": 0.0, "cam_c": 0.0,
    })
    dense: Dict[str, float] = dataclasses.field(default_factory=lambda: {
        "dense_rgb_colors": 2.5e-3, "dense_unnorm_rotations": 1e-3,
        "dense_logit_opacities": 0.0, "dense_log_scales": 0.0,
    })


@dataclasses.dataclass
class RasterizerConfig:
    backend: str = "pallas"  # pallas | tiled | oracle
    max_span: int = 4  # tiles per axis per Gaussian before cropping
    chunk: int = 128
    capacity: int = 1024  # tiled backend per-tile capacity
    # run the Pallas kernels in the interpreter (CPU-testable end-to-end)
    interpret: bool = False
    near: float = 0.01
    far: float = 100.0
    bg: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    # geometry-phase binning amortization (pallas backend): scan segments
    # of up to this many steps reuse per-view binnings computed once at
    # segment entry (track LRs move means ~1.6e-5/step, so the duplicate
    # -and-sort permutation is stable over tens of steps; drift is bounded
    # by re-binning at segment entry). 0 = off — fresh binning every
    # render (exact, the reference's semantics). -1 = AUTO (the default):
    # 0 when schedule.views_per_step == 1 (the "reference parity" mode
    # must mean the reference's exact per-render fresh sort,
    # train.py:663 + N1 binning) and 25 in the batched all-views mode,
    # where the approximation is validated (tests/test_geo_rebin.py,
    # docs/runs/r03_headline). Resolve with
    # ``effective_track_rebin_freq(cfg)``; trajectory semantics are
    # exact when geometry LRs are zero and trajectory-matching at the
    # reference track LRs. Measured on a v5e: batched step
    # 60.4 -> 46.5 ms.
    track_rebin_freq: int = -1


def effective_track_rebin_freq(cfg: "Config") -> int:
    """Resolve ``raster.track_rebin_freq`` (-1 = auto, mode-dependent).

    Parity mode (``schedule.views_per_step == 1``) means the reference's
    exact semantics — a fresh duplicate-and-sort every render
    (train.py:663 + N1 binning) — so auto resolves to 0 there; the
    batched all-views mode resolves to 25, where the frozen-binning
    approximation is validated (tests/test_geo_rebin.py,
    docs/runs/r03_headline). Explicit values (>= 0) always win.
    """
    f = cfg.raster.track_rebin_freq
    if f >= 0:
        return f
    return 0 if cfg.schedule.views_per_step == 1 else 25


@dataclasses.dataclass
class ScheduleConfig:
    """Iteration schedule (reference train.py:767-780)."""

    frame_num: int = 800
    init_opt_num: int = 7000
    opt_num: int = 1100
    dense_opt_num: int = 301
    # dense iterations on TRACKED frames (t > 0): -1 = same as
    # dense_opt_num (reference parity, train.py:776). Tracked frames
    # warm-start from the previous frame's dense colors held by the
    # soft_color anchor, so a shorter schedule reaches the same
    # quality: 150 is VALIDATED by the r05 tex8k protocol's all-view
    # PSNR curves (<= 0.013 dB gained after iteration ~150 on tracked
    # frames; docs/runs/r05_tex8k_seam) — halves the dense phase's
    # tracked-frame cost (bench tex_sec_per_frame_tracked150)
    dense_opt_num_tracked: int = -1
    polish_iters: int = 100  # final color-polish window (train.py:705)
    eye_freeze_frac: float = 0.7  # frame-0 eye-region freeze (train.py:683)
    log_freq: int = 500
    dense_log_freq: int = 300
    ckp_freq: int = 5
    views_per_step: int = 1  # 1 = reference parity; 0 = all views batched
    # batched mode (views_per_step=0) steps per frame; 0 = auto
    # (ceil(opt_num / num_views) — every step consumes all views)
    batched_opt_num: int = 0
    # scan runs of identically-configured iterations into one device
    # program (semantics identical to per-iteration dispatch)
    use_scan: bool = True
    # batched mode: render all views in ONE fused kernel launch on a
    # virtual tall canvas instead of a sequential lax.map (single-device
    # pallas only; exact — tested per-view parity)
    fuse_views: bool = False
    # overlap the per-frame host IO (checkpoint pickling, OBJ write, 8K
    # bake + PNG encode) with the NEXT frame's device compute on a worker
    # thread (SURVEY §5 frame-pipeline axis; jnp arrays are immutable so
    # the captured snapshots are race-free). At most one frame of IO is
    # in flight; failures surface at the next frame boundary
    async_export: bool = True


@dataclasses.dataclass
class DataConfig:
    input_dir: str = ""
    dense_input_dir: str = ""
    output_dir: str = "output"
    exp: str = "exp_op1"  # reference argparse default (train.py:762)
    seq: str = "seq_01"
    down_ratio: int = 8
    dense_down_ratio: int = 1
    use_mask: bool = True
    use_mask_dense: bool = False
    startup_mesh: str = "face_v5.obj"
    regions_pkl: str = "assets/facial_regions.pkl"
    # resume checkpoint backend: "pickle" (single-host default) or
    # "orbax" (async-safe directory semantics, multi-host aware)
    checkpoint_backend: str = "pickle"
    rotate_mask: Dict[str, int] = dataclasses.field(
        default_factory=lambda: dict(DEFAULT_ROTATE_MASK)
    )
    blacklist: List[str] = dataclasses.field(default_factory=list)
    cmap_index: Dict[str, int] = dataclasses.field(
        default_factory=lambda: dict(DEFAULT_CMAP_INDEX)
    )
    log_views: List[str] = dataclasses.field(
        default_factory=lambda: ["K98707293"]
    )
    max_cams: int = 24


@dataclasses.dataclass
class TextureConfig:
    gen_tex: bool = False
    tex_res: int = 8192
    density: int = 30
    bake_window: int = 16
    bake_bands: int = 8
    # bake kernel: "pallas" (compact z-buffer kernel — the production 8K
    # path), "xla" (banded scatter bake), or "auto" (pallas on
    # accelerators, xla on CPU)
    bake_backend: str = "auto"
    # dense-loop re-binning cadence (pallas backend): 0 = compute the
    # tile permutation once per (frame, view) — valid because dense
    # means3D are frozen within a frame (train.py:715-743) — any k>0 =
    # re-bin a view after k uses (1 = reference parity, every iteration)
    rebin_freq: int = 0
    # shard each dense render's TILE axis across all devices (the 4K
    # texture phase renders one view per iteration, where view-sharding
    # cannot help); single-device runs ignore this
    tile_shard: bool = False
    # blend at most this many NON-EMPTY tiles per dense render (the 4K
    # canvas is mostly empty background around the head). -1 = AUTO (the
    # default): the trainer reads the frame's exact occupancy off the
    # frozen per-view binnings and sizes the capacity to
    # occupancy x 1.2 rounded up to 2048 (sticky across frames — it only
    # grows, so recompiles are rare and in-frame overflow is impossible
    # by construction). 0 = off. >0 = manual capacity; occupied tiles
    # beyond it are dropped and counted in the render's num_overflow —
    # size generously (the trainer warns if a frame ever overflows)
    tile_capacity: int = -1
    # rematerialize the dense photometric loss in backward. OFF by
    # default since r3: the Pallas blur kernel's custom VJP saves no
    # conv residuals, so remat's re-forward is pure overhead (29.2 vs
    # 20.9 ms at 4K measured) at a ~2 GB residual-memory cost that fits
    # HBM comfortably; turn on for memory-constrained configs
    remat_photometric: bool = False
    # log the mean dense PSNR over ALL views (eval-only renders) at each
    # dense log row — the saturation-curve evidence for reduced tracked
    # schedules (costs V extra renders per log row; off by default)
    allview_eval: bool = False
    # split-pack (pallas backend, frozen-binning dense loop): gather only
    # the per-step LEARNED packed rows (conics from the learning
    # rotations + colors); means2d/depth/opacity are frame constants
    # captured in the binning's static rows (up to one-ulp projection
    # reassociation across compiles). Learned-parameter gradients are
    # the same ops; the frozen params' (zero-LR) gradients are not
    # materialized
    split_pack: bool = True


@dataclasses.dataclass
class Config:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    schedule: ScheduleConfig = dataclasses.field(default_factory=ScheduleConfig)
    raster: RasterizerConfig = dataclasses.field(default_factory=RasterizerConfig)
    weights: LossWeights = dataclasses.field(default_factory=LossWeights)
    dense_weights: DenseLossWeights = dataclasses.field(
        default_factory=DenseLossWeights
    )
    lrs: LearningRates = dataclasses.field(default_factory=LearningRates)
    texture: TextureConfig = dataclasses.field(default_factory=TextureConfig)
    # per-region one-ring weight multipliers (reference train.py:546-585)
    iso_region_multipliers: Dict[str, float] = dataclasses.field(
        default_factory=lambda: dict(ISO_REGION_MULTIPLIERS)
    )
    rigid_region_multipliers: Dict[str, float] = dataclasses.field(
        default_factory=lambda: dict(RIGID_REGION_MULTIPLIERS)
    )
    rot_region_multipliers: Dict[str, float] = dataclasses.field(
        default_factory=lambda: dict(ROT_REGION_MULTIPLIERS)
    )
    # one-ring neighbor weight sharpness exp(-k d^2) (train.py:196)
    neighbor_weight_k: float = 2000.0

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        raw = json.loads(text)
        return cls(
            data=DataConfig(**raw.get("data", {})),
            schedule=ScheduleConfig(**raw.get("schedule", {})),
            raster=RasterizerConfig(**{
                **raw.get("raster", {}),
                "bg": tuple(raw.get("raster", {}).get("bg", (0, 0, 0))),
            }),
            weights=LossWeights(**raw.get("weights", {})),
            dense_weights=DenseLossWeights(**raw.get("dense_weights", {})),
            lrs=LearningRates(**raw.get("lrs", {})),
            texture=TextureConfig(**raw.get("texture", {})),
            iso_region_multipliers=raw.get(
                "iso_region_multipliers", dict(ISO_REGION_MULTIPLIERS)
            ),
            rigid_region_multipliers=raw.get(
                "rigid_region_multipliers", dict(RIGID_REGION_MULTIPLIERS)
            ),
            rot_region_multipliers=raw.get(
                "rot_region_multipliers", dict(ROT_REGION_MULTIPLIERS)
            ),
            neighbor_weight_k=raw.get("neighbor_weight_k", 2000.0),
        )
