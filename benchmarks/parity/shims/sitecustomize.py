"""Compat patches for running the reference implementation on this image.

Shadowing the environment's sitecustomize is intentional: the reference
subprocess needs neither the axon TPU plugin nor JAX. numpy 2.x removed
``infty``, which the reference imports (knowledge_graph.py:9).
"""

import numpy

if not hasattr(numpy, "infty"):
    numpy.infty = numpy.inf

# scipy >= 1.14 rejects torch tensors as sparse-matrix indices; the
# reference indexes CSR label matrices with torch tensors
# (node_classification.py:167). Convert them transparently.
try:
    from scipy.sparse._index import IndexMixin

    _orig_getitem = IndexMixin.__getitem__

    def _torch_safe_getitem(self, key):
        try:
            import torch

            def conv(k):
                if isinstance(k, torch.Tensor):
                    return k.numpy()
                if isinstance(k, tuple):
                    return tuple(conv(x) for x in k)
                return k

            key = conv(key)
        except ImportError:  # pragma: no cover
            pass
        return _orig_getitem(self, key)

    IndexMixin.__getitem__ = _torch_safe_getitem
except Exception:  # pragma: no cover
    pass
