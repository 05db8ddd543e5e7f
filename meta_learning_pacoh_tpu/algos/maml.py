"""Placeholder — implemented later this round."""


class MAMLRegression:
    def __init__(self, *a, **k):
        raise NotImplementedError("maml not yet implemented")
