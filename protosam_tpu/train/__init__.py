from protosam_tpu.train.step import TrainState, make_train_step, weighted_ce  # noqa: F401
