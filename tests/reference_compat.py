"""Import helpers for running the PyTorch reference on CPU in golden tests.

The reference lives read-only at /root/reference and is CUDA-centric; we
monkeypatch ``.cuda()`` to a no-op (see conftest) and import only the modules
that need nothing beyond torch/numpy.
"""

import sys

REFERENCE_ROOT = "/root/reference"


def import_reference_alpmodule():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models import alpmodule  # noqa
    return alpmodule
