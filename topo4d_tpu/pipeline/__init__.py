from topo4d_tpu.pipeline.scene import SceneStatics, build_scene, build_constraints
from topo4d_tpu.pipeline.trainer import Trainer
