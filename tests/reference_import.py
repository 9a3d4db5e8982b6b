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


class STFTParamsStub:
    """Stand-in for audiotools.STFTParams (a plain record)."""

    def __init__(self, window_length=2048, hop_length=512,
                 window_type=None, match_stride=False, padding_type=None):
        self.window_length = window_length
        self.hop_length = hop_length
        self.window_type = window_type
        self.match_stride = match_stride
        self.padding_type = padding_type


class AudioSignalStub:
    """Minimal differentiable audiotools.AudioSignal stand-in: torch.stft
    with audiotools' conventions (center=True reflect padding, periodic
    hann, match_stride right-pad + (w-hop)//2 pad + 2-edge-frame drop).

    Used so the GENUINE reference MRD discriminator
    (/root/reference/models/discriminator.py:129-158) can run without the
    audiotools package; the stft math itself mirrors audiotools
    AudioSignal.stft / compute_stft_padding, the same convention
    vrvq_tpu/ops/stft.py is value-tested against (tests/test_stft.py).
    """

    def __init__(self, audio_data, sample_rate, stft_params=None):
        self.audio_data = audio_data
        self.sample_rate = sample_rate
        self.stft_params = stft_params or STFTParamsStub()
        self.stft_data = None

    def stft(self, window_length=None, hop_length=None, window_type=None):
        p = self.stft_params
        w = window_length or p.window_length
        hop = hop_length or p.hop_length
        match_stride = p.match_stride
        x = self.audio_data  # (B, C, T)
        b, c, t = x.shape
        flat = x.reshape(b * c, t)
        if match_stride:
            assert hop == w // 4
            right_pad = -(-t // hop) * hop - t
            pad = (w - hop) // 2
            flat = torch.nn.functional.pad(
                flat[:, None], (pad, pad + right_pad), mode="reflect"
            )[:, 0]
        window = torch.hann_window(w, periodic=True, dtype=flat.dtype)
        spec = torch.stft(
            flat, n_fft=w, hop_length=hop, win_length=w, window=window,
            center=True, pad_mode="reflect", return_complex=True,
        )
        if match_stride:
            spec = spec[..., 2:-2]
        self.stft_data = spec.reshape(b, c, *spec.shape[-2:])
        return self.stft_data

    @property
    def magnitude(self):
        if self.stft_data is None:
            self.stft()
        return torch.abs(self.stft_data)


def _install_stubs():
    if "torchmetrics" not in sys.modules:
        sys.modules["torchmetrics"] = types.ModuleType("torchmetrics")
    if "audiotools" not in sys.modules:
        at = types.ModuleType("audiotools")
        at_ml = types.ModuleType("audiotools.ml")
        at_ml.BaseModel = torch.nn.Module
        at.ml = at_ml
        at.AudioSignal = AudioSignalStub
        at.STFTParams = STFTParamsStub
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


def import_reference_discriminator():
    """Return the reference ``models.discriminator`` module (genuine
    source; its MRD path runs through the AudioSignalStub stft above)."""
    _install_stubs()
    import models.discriminator as ref_disc

    assert Path(ref_disc.__file__).resolve().is_relative_to(REFERENCE_ROOT)
    return ref_disc


def import_reference_moe():
    """Return the reference ``models.dac_moe`` module (genuine source)."""
    _install_stubs()
    import models.dac_moe as ref_moe

    assert Path(ref_moe.__file__).resolve().is_relative_to(REFERENCE_ROOT)
    return ref_moe
