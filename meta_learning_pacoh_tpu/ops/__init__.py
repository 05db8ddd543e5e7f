from meta_learning_pacoh_tpu.ops import kernels, gp, distributions, svgd, rootfind
