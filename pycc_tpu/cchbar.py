"""Placeholder — implemented in a later milestone this round."""


class cchbar:
    def __init__(self, *a, **k):
        raise NotImplementedError("cchbar: coming in a later milestone")
