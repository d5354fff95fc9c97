from topo4d_tpu.opt.adam import AdamState, adam_init, adam_update, reset_moments
from topo4d_tpu.opt.constraints import ScatterConstraint, apply_constraints
