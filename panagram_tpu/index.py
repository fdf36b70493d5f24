"""Index: the on-disk pan-kmer index, write + read API.

Placeholder — full implementation lands with the index layer.
"""


class Index:  # pragma: no cover - replaced in the index-layer milestone
    def __init__(self, *a, **kw):
        raise NotImplementedError("Index layer under construction")
