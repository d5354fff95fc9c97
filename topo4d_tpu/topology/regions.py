"""Facial region masks and per-region loss-weight scheduling.

The reference ships ``assets/facial_regions.pkl`` — a dict of vertex-index
masks (26 named regions + derived masks) and precomputed flatten-face
subsets (schema enumerated in SURVEY §2; loaded at train.py:152-153).
This module loads that schema and rebuilds the per-region iso/rigid/rot
weight matrices of train.py:546-585 from a declarative multiplier table
(the scientific payload lives in config, not code — SURVEY §5).
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import Dict, List, Mapping, Sequence

import numpy as np

# The 26 named regions (reference train.py:37-43).
FACE_REGION_NAMES: List[str] = [
    "Caruncle", "Chin", "Ear", "EarNeckBack", "EarSocket", "EyeLidBottom",
    "EyeLidInnerBottom", "EyeLidInnerTop", "EyeLidOuterTop",
    "EyeLidOuterBottom", "EyeLidTop", "EyeSocket", "Face", "HeadBack",
    "LipBottom", "LipInnerBottom", "LipInnerTop", "LipOuterBottom",
    "LipOuterTop", "LipTop", "MouthSocket", "MouthSocketBottom",
    "MouthSocketTop", "NeckBack", "NeckFront", "Nostril",
]

# Derived masks present in the pkl (SURVEY §2.2).
DERIVED_MASK_KEYS: List[str] = [
    "face_flat_masks", "lip_socket_flat_masks", "eye_lid_up_masks",
    "lip_flat_edge_masks", "face_masks", "face_bottom_masks",
    "dynamic_masks", "dynamic_eye_masks", "dynamic_mouth_masks",
    "eye_around_masks", "eye_inner_masks", "eye_del_masks",
    "mouth_around_masks", "mouth_inner_masks", "static_masks",
]

# Precomputed flatten-loss face subsets in the pkl.
FLAT_FACE_KEYS: List[str] = [
    "flat_faces", "lip_bottom_flat_faces", "lip_flat_faces",
    "mouth_flat_faces", "lid_top_flat_faces", "lid_bottom_flat_faces",
]


@dataclasses.dataclass
class FacialRegions:
    """Typed view over the facial_regions.pkl schema."""

    region_masks: Dict[str, np.ndarray]  # name -> vertex indices
    masks: Dict[str, np.ndarray]  # derived mask name -> vertex indices
    flat_faces: Dict[str, np.ndarray]  # flatten subset name -> (F, 3) tris

    def mask(self, key: str) -> np.ndarray:
        if key in self.masks:
            return self.masks[key]
        return self.region_masks[key]

    @classmethod
    def from_pickle(cls, path: str) -> "FacialRegions":
        with open(path, "rb") as fh:
            raw = pickle.load(fh)
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: Mapping) -> "FacialRegions":
        region_masks = {
            k: np.asarray(v, np.int32) for k, v in raw["region_masks"].items()
        }
        masks = {
            k: np.asarray(raw[k], np.int32) for k in DERIVED_MASK_KEYS if k in raw
        }
        flat_faces = {
            k: np.asarray(raw[k], np.int32) for k in FLAT_FACE_KEYS if k in raw
        }
        return cls(region_masks=region_masks, masks=masks, flat_faces=flat_faces)


def load_facial_regions(path: str) -> FacialRegions:
    return FacialRegions.from_pickle(path)


# Per-region multipliers applied to the one-ring weight matrices before the
# global loss weight multiplies back in (reference train.py:546-585: each
# entry there is ``weight *= multiplier / global_weight`` — the tables below
# store the raw multipliers).
ISO_REGION_MULTIPLIERS: Dict[str, float] = {
    "eye_lid_up_masks": 0.0,
    "EyeLidOuterTop": 0.0,
    "EyeLidTop": 0.0,
    "mouth_inner_masks": 5.0,
    "Chin": 0.0,
    "LipOuterTop": 0.0,
    "LipOuterBottom": 1.0,
    "EyeSocket": 0.0,
    "MouthSocket": 0.0,
    "NeckFront": 0.0,
    "face_flat_masks": 0.0,
}

RIGID_REGION_MULTIPLIERS: Dict[str, float] = {
    "eye_lid_up_masks": 0.0,
    "EyeLidOuterTop": 0.0,
    "EyeLidTop": 0.0,
    "mouth_inner_masks": 0.5,
    "Chin": 0.0,
    "LipOuterTop": 0.0,
    "LipOuterBottom": 0.1,
    "MouthSocket": 0.0,
    "EyeSocket": 0.0,
    "NeckFront": 0.0,
    "face_flat_masks": 0.0,
}

ROT_REGION_MULTIPLIERS: Dict[str, float] = {
    "EyeLidOuterTop": 50.0,
    "EyeLidTop": 50.0,
    "EyeLidBottom": 100.0,
    "EyeSocket": 100.0,
    "eye_inner_masks": 100.0,
}


def build_region_weight_matrix(
    base_weight: np.ndarray,  # (N, K) one-ring Gaussian weights
    regions: FacialRegions,
    multipliers: Mapping[str, float],
    global_weight: float,
) -> np.ndarray:
    """Apply per-region row scaling ``w[mask] *= mult / global_weight``.

    Matches the reference exactly, INCLUDING sequential over-application
    when masks overlap (train.py:546-585 applies multipliers one after
    another, so a vertex in two masks gets both factors).
    """
    w = base_weight.copy()
    if global_weight == 0:
        return w
    for key, mult in multipliers.items():
        rows = regions.mask(key)
        w[rows, :] *= mult / global_weight
    return w


def region_lookup(regions: FacialRegions, num_vertices: int) -> Dict[str, np.ndarray]:
    """Boolean lookup vectors for each mask (scatter-friendly constants)."""
    out = {}
    for name, idx in {**regions.region_masks, **regions.masks}.items():
        b = np.zeros(num_vertices, bool)
        b[idx] = True
        out[name] = b
    return out
