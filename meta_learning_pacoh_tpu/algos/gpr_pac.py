"""Placeholder — implemented later this round."""


class GPRegressionLearnedPAC:
    def __init__(self, *a, **k):
        raise NotImplementedError("gpr_pac not yet implemented")
