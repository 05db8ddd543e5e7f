"""Placeholder — implemented later this round."""


class GPRegressionMetaLearnedSVGD:
    def __init__(self, *a, **k):
        raise NotImplementedError("pacoh_svgd not yet implemented")
