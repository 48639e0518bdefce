from tise_tpu.core import config, io, mesh
