"""Golden-fixture tests for real-asset ingestion.

VERDICT round-1 item 9: the pkl-region schema, the Agisoft XML parse and
the quad-OBJ-with-UV-seams path were previously exercised only through
self-generated fixtures. These tests pin them against (a) the REAL
``facial_regions.pkl`` shipped by the reference (loaded read-only from
/root/reference/assets when present — reference train.py:152-153), (b) a
reference-shaped multi-sensor Agisoft XML including a component-less
chunk (reference camera.py:45-170), and (c) a quad OBJ with a UV seam.
"""

import os
import textwrap

import numpy as np
import pytest

from topo4d_tpu.core.agisoft import load_camera
from topo4d_tpu.topology.obj_io import load_obj, vertex_uv_multiplicity
from topo4d_tpu.topology.regions import (
    DERIVED_MASK_KEYS,
    FACE_REGION_NAMES,
    FLAT_FACE_KEYS,
    ISO_REGION_MULTIPLIERS,
    build_region_weight_matrix,
    load_facial_regions,
    region_lookup,
)

REAL_PKL = "/root/reference/assets/facial_regions.pkl"


# ------------------------------------------------------ facial_regions.pkl


@pytest.mark.skipif(
    not os.path.exists(REAL_PKL), reason="reference assets not present"
)
def test_real_facial_regions_pkl_loads():
    """The REAL reference pkl parses into the typed schema completely."""
    regions = load_facial_regions(REAL_PKL)
    # all 26 named regions present, exactly
    assert sorted(regions.region_masks) == sorted(FACE_REGION_NAMES)
    # every derived mask key the pipeline consumes exists in the real file
    for key in DERIVED_MASK_KEYS:
        assert key in regions.masks, key
        assert regions.masks[key].dtype == np.int32  # int64/list normalized
        assert regions.masks[key].ndim == 1
    # every flatten face subset exists and is (F, 3) triangles
    for key in FLAT_FACE_KEYS:
        assert key in regions.flat_faces, key
        assert regions.flat_faces[key].shape[1] == 3
    # vertex ids cover exactly the 8,280-vertex startup mesh (0..8279)
    n = 8280
    all_ids = np.concatenate(
        [v for v in regions.region_masks.values()]
        + [v for v in regions.masks.values()]
        + [v.reshape(-1) for v in regions.flat_faces.values()]
    )
    assert all_ids.min() >= 0
    assert all_ids.max() == n - 1


@pytest.mark.skipif(
    not os.path.exists(REAL_PKL), reason="reference assets not present"
)
def test_real_pkl_drives_region_weighting():
    """region_lookup + weight-matrix scaling run on the real id ranges."""
    regions = load_facial_regions(REAL_PKL)
    n = 8280
    lookup = region_lookup(regions, n)
    assert lookup["static_masks"].sum() == len(regions.masks["static_masks"])
    base = np.ones((n, 4), np.float32)
    w = build_region_weight_matrix(base, regions, ISO_REGION_MULTIPLIERS, 20.0)
    # eye_lid_up rows zeroed (multiplier 0.0), mouth_inner scaled 5/20
    assert (w[regions.masks["eye_lid_up_masks"]] == 0).all()
    inner = regions.masks["mouth_inner_masks"]
    only_inner = np.setdiff1d(
        inner,
        np.concatenate([
            regions.mask(k)
            for k, m in ISO_REGION_MULTIPLIERS.items()
            if k != "mouth_inner_masks"
        ]),
    )
    assert only_inner.size  # schema sanity: some rows see only this rule
    np.testing.assert_allclose(w[only_inner], 5.0 / 20.0)


# ----------------------------------------------------------- Agisoft XML

MULTI_SENSOR_XML = textwrap.dedent("""\
    <document version="1.5.0">
      <chunk label="head" enabled="true">
        <sensors next_id="2">
          <sensor id="0" label="landscape" type="frame">
            <resolution width="4096" height="3000"/>
            <property name="pixel_width" value="0.0034"/>
            <property name="pixel_height" value="0.0034"/>
            <calibration type="frame" class="adjusted">
              <resolution width="4096" height="3000"/>
              <f>8000.5</f>
              <cx>12.25</cx>
              <cy>-7.5</cy>
              <k1>0.02</k1>
              <k2>-0.001</k2>
            </calibration>
          </sensor>
          <sensor id="1" label="portrait" type="frame">
            <resolution width="3000" height="4096"/>
            <calibration type="frame" class="adjusted">
              <f>7800.0</f>
            </calibration>
          </sensor>
        </sensors>
        <components next_id="1" active_id="0">
          <component id="0" label="co">
            <transform>
              <rotation>0 -1 0 1 0 0 0 0 1</rotation>
              <translation>0.1 0.2 0.3</translation>
            </transform>
          </component>
        </components>
        <cameras next_id="2">
          <camera id="0" sensor_id="0" component_id="0" label="camA">
            <transform>1 0 0 0.5  0 1 0 0.25  0 0 1 2.0  0 0 0 1</transform>
          </camera>
          <camera id="1" sensor_id="1" component_id="0" label="camB">
            <transform>0 0 1 1.0  0 1 0 0.0  -1 0 0 0.0  0 0 0 1</transform>
          </camera>
        </cameras>
      </chunk>
    </document>
""")

# same chunk without a <components> node at all (Metashape exports from
# single-component projects can omit it; trans_g must default to identity)
NO_COMPONENT_XML = MULTI_SENSOR_XML.replace(
    MULTI_SENSOR_XML[
        MULTI_SENSOR_XML.index("<components") :
        MULTI_SENSOR_XML.index("</components>") + len("</components>")
    ],
    "",
)


@pytest.fixture()
def xml_paths(tmp_path):
    p1 = tmp_path / "cameras.xml"
    p1.write_text(MULTI_SENSOR_XML)
    p2 = tmp_path / "cameras_nocomp.xml"
    p2.write_text(NO_COMPONENT_XML)
    return str(p1), str(p2)


def test_agisoft_multi_sensor_intrinsics(xml_paths):
    """Landscape sensor at resize 8: floor sizes, scaled f and pp."""
    cam, trans_g = load_camera(xml_paths[0], "camA", resize_factor=8, rt=0)
    k = cam["intrinsics"]
    # f/8, cx = (4096/2 + 12.25)/8, cy = (3000/2 - 7.5)/8
    np.testing.assert_allclose(k[0, 0], 8000.5 / 8)
    np.testing.assert_allclose(k[0, 2], (2048 + 12.25) / 8)
    np.testing.assert_allclose(k[1, 2], (1500 - 7.5) / 8)
    # img_size is (h, w) with floor division
    np.testing.assert_array_equal(cam["image_size"], [375, 512])
    # component transform parsed into trans_g
    expect_g = np.eye(4)
    expect_g[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]])
    expect_g[:3, 3] = [0.1, 0.2, 0.3]
    np.testing.assert_allclose(trans_g, expect_g)


def test_agisoft_portrait_sensor_rotation_swap(xml_paths):
    """rot != 0 swaps the principal point into the rotated frame.

    Reference camera.py:102-113: K = [[f, 0, cy], [0, f, w - cx]] and
    image_size becomes (w, h).
    """
    cam, _ = load_camera(xml_paths[0], "camB", resize_factor=1, rt=1)
    k = cam["intrinsics"]
    w, h = 3000, 4096  # sensor resolution (portrait)
    cx, cy = w / 2.0, h / 2.0  # no cx/cy children -> center default
    np.testing.assert_allclose(k[0, 0], 7800.0)
    np.testing.assert_allclose(k[0, 2], cy)
    np.testing.assert_allclose(k[1, 2], w - cx)
    np.testing.assert_array_equal(cam["image_size"], [w, h])


def test_agisoft_extrinsics_opengl_colmap_flip(xml_paths):
    """camA extrinsics: GL y/z flip then COLMAP flip, hand-computed."""
    cam, _ = load_camera(xml_paths[0], "camA", resize_factor=1, rt=0)
    # c2w (OpenGL cols y,z negated) = [[1,0,0,.5],[0,-1,0,.25],[0,0,-1,2]]
    # inv of that (R diag(1,-1,-1), t) -> w2c_gl = [[1,0,0,-.5],
    # [0,-1,0,.25],[0,0,-1,2]]; COLMAP flip negates rows 1,2:
    expect = np.array(
        [[1, 0, 0, -0.5], [0, 1, 0, -0.25], [0, 0, 1, -2.0]], float
    )
    np.testing.assert_allclose(cam["extrinsics"], expect, atol=1e-12)
    np.testing.assert_allclose(cam["camera_center"], [0.5, 0.25, 2.0])


def test_agisoft_component_less_chunk(xml_paths):
    """A chunk without <components> yields identity trans_g, same cams."""
    cam_a, trans_g = load_camera(xml_paths[1], "camA", resize_factor=8)
    np.testing.assert_allclose(trans_g, np.eye(4))
    cam_ref, _ = load_camera(xml_paths[0], "camA", resize_factor=8)
    np.testing.assert_allclose(cam_a["extrinsics"], cam_ref["extrinsics"])
    np.testing.assert_allclose(cam_a["intrinsics"], cam_ref["intrinsics"])


# ---------------------------------------------------- quad OBJ + UV seam

SEAM_OBJ = textwrap.dedent("""\
    # 2x1 quad strip whose middle vertex column sits on a UV seam:
    # vertices 1/4 appear with uv u=0.45 for the left quad and u=0.55
    # for the right quad
    v 0 0 0
    v 1 0 0
    v 1 1 0
    v 0 1 0
    v 2 0 0
    v 2 1 0
    vt 0.05 0.05
    vt 0.45 0.05
    vt 0.45 0.95
    vt 0.05 0.95
    vt 0.55 0.05
    vt 0.95 0.05
    vt 0.95 0.95
    vt 0.55 0.95
    f 1/1 2/2 3/3 4/4
    f 2/5 5/6 6/7 3/8
""")


@pytest.fixture()
def seam_mesh(tmp_path):
    p = tmp_path / "face_v5.obj"
    p.write_text(SEAM_OBJ)
    return load_obj(str(p))


def test_quad_obj_with_uv_seam_loads(seam_mesh):
    mesh = seam_mesh
    assert mesh.vertices.shape == (6, 3)
    assert mesh.uvs.shape == (8, 2)
    assert [len(f) for f in mesh.faces] == [4, 4]
    assert mesh.faces[0] == [0, 1, 2, 3]
    assert mesh.uv_faces[1] == [4, 5, 6, 7]
    mult = vertex_uv_multiplicity(
        mesh.num_vertices, mesh.faces, mesh.uv_faces, mesh.uvs
    )
    # seam vertices 1 and 2 carry TWO distinct uv coords, the rest one
    assert [len(m) for m in mult] == [1, 2, 2, 1, 1, 1]


def test_uv_seam_densification_does_not_share_across_seam(seam_mesh):
    """Subdivision points are NOT deduped across the seam edge.

    helpers.py:436-467: the edge (1, 2) has two UV images; sharing its
    dense points would smear texture across the seam. Both quads being
    frontal, each contributes its own copy of the edge's interior points.
    """
    from topo4d_tpu.topology.densify_uv import densify_quads

    mesh = seam_mesh
    mult = [
        len(m)
        for m in vertex_uv_multiplicity(
            mesh.num_vertices, mesh.faces, mesh.uv_faces, mesh.uvs
        )
    ]
    density = 2
    topo = densify_quads(
        mesh.vertices,
        mesh.uvs,
        np.asarray(mesh.faces),
        np.asarray(mesh.uv_faces),
        density,
        mult,
    )
    # edge (1, 2) has both endpoints multi-UV -> NOT shareable; both quad
    # instances allocate their own copy. The 6 single-UV edges dedup to 6
    # shared groups (no edge is shared between the two quads except the
    # seam one).
    assert topo.num_seam_edge_instances == 2
    assert topo.num_shared_edges == 6
    # total new points: (shared + seam-instance) * density + interior
    expect_new = (6 + 2) * density + 2 * density * density
    assert topo.dense_vertices.shape[0] == mesh.num_vertices + expect_new
    # seam copies land at the same 3D position but distinct ids/uvs
    dense_v = topo.dense_vertices
    n_on_edge = int(
        (np.isclose(dense_v[:, 0], 1.0)
         & (dense_v[:, 1] > 1e-6) & (dense_v[:, 1] < 1 - 1e-6)).sum()
    )
    assert n_on_edge == 2 * density
