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


def import_sam_modeling():
    """Load the reference's segment_anything.modeling subpackage standalone.

    The parent package's __init__ imports the (uninstalled) pip
    ``segment_anything``, so we mount ``modeling`` as its own top-level
    package instead.
    """
    import importlib.util

    name = "ref_sam_modeling"
    if name in sys.modules:
        return sys.modules[name]
    root = f"{REFERENCE_ROOT}/models/segment_anything/modeling"
    spec = importlib.util.spec_from_file_location(
        name, f"{root}/__init__.py", submodule_search_locations=[root])
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
