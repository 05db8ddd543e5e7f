"""Placeholder — implemented later this round."""


class NPRegressionMetaLearned:
    def __init__(self, *a, **k):
        raise NotImplementedError("npr not yet implemented")
