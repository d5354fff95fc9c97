from topo4d_tpu.topology.obj_io import (
    MeshObj,
    load_obj,
    write_obj_with_uv,
    vertex_uv_multiplicity,
)
from topo4d_tpu.topology.adjacency import (
    find_adjacent_vertices,
    pad_one_ring,
    OneRing,
    build_one_ring,
    triangulate_faces,
    faces_fully_inside,
    faces_touching,
    split_faces_by_mask,
)
from topo4d_tpu.topology.normals import vertex_normals
from topo4d_tpu.topology.knn import knn_sq_dists
from topo4d_tpu.topology.regions import FacialRegions, load_facial_regions
from topo4d_tpu.topology.densify_uv import DenseTopology, build_dense_topology
from topo4d_tpu.topology.interpolate import interpolate_dense_attribute
