"""Placeholder — implemented later this round."""


class GPRegressionMetaLearnedPAC:
    def __init__(self, *a, **k):
        raise NotImplementedError("pacoh_mlap not yet implemented")
