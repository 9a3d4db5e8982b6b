"""Import the GENUINE reference source (/root/reference) for parity tests.

The reference's only hard import-time dependencies beyond torch/einops are
``audiotools`` (BaseModel base class, AudioSignal symbol) and
``torchmetrics`` (module-level import in models/utils.py) — neither is
installed here, and neither is exercised by the encode path we test
against. We register minimal stand-ins in sys.modules so the reference
modules import unchanged; no reference code is modified or copied.
"""

import sys
import types
from pathlib import Path

import torch

REFERENCE_ROOT = Path("/root/reference")


def _install_stubs():
    if "torchmetrics" not in sys.modules:
        sys.modules["torchmetrics"] = types.ModuleType("torchmetrics")
    if "audiotools" not in sys.modules:
        at = types.ModuleType("audiotools")
        at_ml = types.ModuleType("audiotools.ml")
        at_ml.BaseModel = torch.nn.Module
        at.ml = at_ml
        at.AudioSignal = object  # only referenced inside (unused) methods
        at.STFTParams = object
        sys.modules["audiotools"] = at
        sys.modules["audiotools.ml"] = at_ml
    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))


def import_reference_dac():
    """Return the reference ``models.dac_vrvq`` module (genuine source)."""
    _install_stubs()
    import models.dac_vrvq as ref_dac  # namespace pkg under /root/reference

    assert Path(ref_dac.__file__).resolve().is_relative_to(REFERENCE_ROOT)
    return ref_dac


def import_reference_moe():
    """Return the reference ``models.dac_moe`` module (genuine source)."""
    _install_stubs()
    import models.dac_moe as ref_moe

    assert Path(ref_moe.__file__).resolve().is_relative_to(REFERENCE_ROOT)
    return ref_moe
