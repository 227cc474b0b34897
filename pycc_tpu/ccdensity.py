"""Placeholder — implemented in a later milestone this round."""


class ccdensity:
    def __init__(self, *a, **k):
        raise NotImplementedError("ccdensity: coming in a later milestone")
