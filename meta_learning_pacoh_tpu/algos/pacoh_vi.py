"""Placeholder — implemented later this round."""


class GPRegressionMetaLearnedVI:
    def __init__(self, *a, **k):
        raise NotImplementedError("pacoh_vi not yet implemented")
