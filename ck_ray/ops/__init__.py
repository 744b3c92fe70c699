"""Operator namespace. Submodules: ann, curation, dedup, multimodal,
percolate, text."""


def bind_ctor(cls, **kwargs):
    """Bind constructor kwargs into a subclass closed over the values.

    ``map_batches(bind_ctor(Cls, a=1))`` instead of
    ``map_batches(Cls, fn_constructor_kwargs={"a": 1})``: the kwargs ride
    inside the cloudpickled class rather than the object store, so
    restartable pool actors never depend on ctor-arg refs staying alive
    (Ray issue #53727 — the 'constructor arguments in the object store
    and max_restarts > 0' warning)."""

    class _Bound(cls):
        def __init__(self):
            super().__init__(**kwargs)

    _Bound.__name__ = cls.__name__
    _Bound.__qualname__ = cls.__qualname__
    return _Bound
