from topo4d_tpu.texture.bake import bake_texture, process_uv
from topo4d_tpu.texture.dense import make_texture_step, TextureState
