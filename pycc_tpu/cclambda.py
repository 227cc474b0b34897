"""Placeholder — implemented in a later milestone this round."""


class cclambda:
    def __init__(self, *a, **k):
        raise NotImplementedError("cclambda: coming in a later milestone")
