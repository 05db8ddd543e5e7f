from meta_learning_pacoh_tpu.models import mlp, gp_base, random_gp
