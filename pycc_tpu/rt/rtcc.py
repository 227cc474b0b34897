"""Placeholder — implemented in a later milestone this round."""


class rtcc:
    def __init__(self, *a, **k):
        raise NotImplementedError
