"""Checkpointing: reference-compatible params.npz + full resumable state.

The reference only SAVES (no resume): every 5 frames it stacks per-frame
param snapshots into ``params.npz``, delta-compressed — frame 0 stores all
non-dense params, later frames only means3D/rgb/rotations
(helpers.py:160-178). We keep that artifact bit-compatible AND add a
resume checkpoint (params + Adam moments + temporal priors + frame index),
which the reference lacks (SURVEY §5 failure-detection row).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

DELTA_KEYS = ("means3D", "rgb_colors", "unnorm_rotations")


def params_snapshot(
    params: Dict, is_initial_timestep: bool
) -> Dict[str, np.ndarray]:
    """Per-frame snapshot (reference ``params2cpu``, helpers.py:160-166)."""
    if is_initial_timestep:
        return {
            k: np.asarray(v)
            for k, v in params.items()
            if not k.startswith("dense")
        }
    return {k: np.asarray(params[k]) for k in DELTA_KEYS}


def save_params(output_params: List[Dict[str, np.ndarray]], out_dir: str):
    """Stack snapshots into params.npz (reference helpers.py:169-178)."""
    to_save = {}
    for k in output_params[0].keys():
        if len(output_params) > 1 and k in output_params[1]:
            to_save[k] = np.stack([p[k] for p in output_params])
        else:
            to_save[k] = output_params[0][k]
    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, "params"), **to_save)


def load_params(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as data:
        return {k: data[k] for k in data.files}


def save_resume(
    out_dir: str,
    frame: int,
    state,
    priors,
    first_frame_attrs: Optional[Dict],
    output_params: List[Dict[str, np.ndarray]],
    texture_state=None,
):
    """Full mid-sequence resume checkpoint (atomic write).

    The per-frame snapshot HISTORY goes to an append-only side stream
    (``snapshots.pkl``): re-pickling the whole history every frame would
    be O(frames^2) IO over an 800-frame sequence. ``resume.pkl`` records
    how many stream records are valid, so a crash between the append and
    the resume write leaves at most one orphan record (ignored on load).
    """
    os.makedirs(out_dir, exist_ok=True)
    spath = os.path.join(out_dir, "snapshots.pkl")
    cpath = spath + ".count"
    n_existing = 0
    if os.path.exists(cpath) and os.path.exists(spath):
        try:
            n_existing = int(open(cpath).read())
        except ValueError:
            n_existing = 0
    if n_existing > len(output_params):
        n_existing = 0  # stale stream from an older run: rewrite
    mode = "ab" if n_existing else "wb"
    with open(spath, mode) as fh:
        for snap in output_params[n_existing:]:
            pickle.dump(snap, fh)
    tmp = cpath + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(len(output_params)))
    os.replace(tmp, cpath)

    payload = {
        "frame": frame,
        "state": jax.tree_util.tree_map(np.asarray, state),
        "priors": jax.tree_util.tree_map(np.asarray, priors),
        "first_frame_attrs": (
            jax.tree_util.tree_map(np.asarray, first_frame_attrs)
            if first_frame_attrs is not None
            else None
        ),
        "n_snapshots": len(output_params),
        "texture_state": (
            jax.tree_util.tree_map(np.asarray, texture_state)
            if texture_state is not None
            else None
        ),
    }
    tmp = os.path.join(out_dir, "resume.pkl.tmp")
    with open(tmp, "wb") as fh:
        pickle.dump(payload, fh)
    os.replace(tmp, os.path.join(out_dir, "resume.pkl"))


def load_resume(out_dir: str):
    path = os.path.join(out_dir, "resume.pkl")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as fh:
        payload = pickle.load(fh)
    if "output_params" not in payload:  # stream format
        n = payload.pop("n_snapshots", 0)
        snaps = []
        spath = os.path.join(out_dir, "snapshots.pkl")
        if n and os.path.exists(spath):
            with open(spath, "rb") as fh:
                for _ in range(n):
                    snaps.append(pickle.load(fh))
        payload["output_params"] = snaps
    return payload


# --------------------------------------------------------------- orbax
# Optional orbax-backed resume (SURVEY §5 checkpoint row): the same
# payload pytree stored through orbax's PyTreeCheckpointer — async-safe
# atomic directory semantics, multi-host aware. The pickle path remains
# the default (single-host, no extra deps at runtime).

def _plain(tree):
    """NamedTuples -> plain dicts (orbax-storable), None fields dropped."""
    if hasattr(tree, "_asdict"):
        tree = tree._asdict()
    if isinstance(tree, dict):
        return {
            k: _plain(v) for k, v in tree.items() if v is not None
        }
    if isinstance(tree, (list, tuple)):
        return [_plain(v) for v in tree]
    return np.asarray(tree)


def save_resume_orbax(out_dir: str, frame: int, state, priors,
                      first_frame_attrs, output_params,
                      texture_state=None):
    import orbax.checkpoint as ocp

    payload = {
        "frame": np.asarray(frame),
        "state": _plain(state),
        "priors": _plain(priors),
        "first_frame_attrs": (
            _plain(first_frame_attrs)
            if first_frame_attrs is not None else {}
        ),
        "output_params": _plain(output_params),
        "texture_state": (
            _plain(texture_state) if texture_state is not None else {}
        ),
    }
    path = os.path.abspath(os.path.join(out_dir, "resume_orbax"))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)


def load_resume_orbax(out_dir: str):
    """Restore the orbax resume payload with typed state reconstructed."""
    import orbax.checkpoint as ocp

    from topo4d_tpu.losses.temporal import TemporalPriors
    from topo4d_tpu.opt.adam import AdamState
    from topo4d_tpu.opt.step import GeometryPriors, TrainState

    path = os.path.abspath(os.path.join(out_dir, "resume_orbax"))
    if not os.path.isdir(path):
        return None
    p = ocp.PyTreeCheckpointer().restore(path)
    state = TrainState(
        params=p["state"]["params"],
        opt=AdamState(**p["state"]["opt"]),
        max_2d_radius=p["state"]["max_2d_radius"],
    )
    pr = dict(p["priors"])
    pr["temporal"] = TemporalPriors(**pr["temporal"])
    pr.pop("neighbor_inv", None)  # dropped field; tolerate old checkpoints
    priors = GeometryPriors(**pr)
    texture_state = None
    if p.get("texture_state"):
        from topo4d_tpu.texture.dense import TextureState

        texture_state = TextureState(
            params=p["texture_state"]["params"],
            opt=AdamState(**p["texture_state"]["opt"]),
        )
    return {
        "frame": int(np.asarray(p["frame"])),
        "state": state,
        "priors": priors,
        "first_frame_attrs": p.get("first_frame_attrs") or None,
        "output_params": [
            {k: np.asarray(v) for k, v in d.items()}
            for d in p["output_params"]
        ],
        "texture_state": texture_state,
    }


def write_loss_json(out_dir: str, losses_enabled: Dict, weights: Dict):
    """One-shot loss config dump (reference helpers.py:826-833)."""
    import json

    path = os.path.join(out_dir, "loss.json")
    if os.path.exists(path):
        return
    os.makedirs(out_dir, exist_ok=True)
    with open(path, "w") as fh:
        json.dump([losses_enabled, weights], fh, indent=4)
