"""Placeholder — implemented in a later milestone this round."""


class cceom:
    def __init__(self, *a, **k):
        raise NotImplementedError("cceom: coming in a later milestone")
