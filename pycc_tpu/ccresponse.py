"""Placeholder — implemented in a later milestone this round."""


class ccresponse:
    def __init__(self, *a, **k):
        raise NotImplementedError


class pertbar:
    def __init__(self, *a, **k):
        raise NotImplementedError
