"""Evaluation metrics: bits-per-frame, codebook entropy, quality metrics.

Reference: models/utils.py:64-150. ``cal_metrics`` dispatches by name like
the reference (mel/stft/waveform via loss objects; SDR family computed
directly — the reference used torchmetrics).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np

import jax.numpy as jnp

from .audio import Signal


def cal_bpf_from_mask(mask, bits_per_codebook: Sequence[int]) -> float:
    """mask (B, Nq, T) -> mean bits per frame
    (reference: models/utils.py:64-73)."""
    mask = jnp.asarray(mask)
    bits = jnp.asarray(list(bits_per_codebook), dtype=mask.dtype).reshape(1, -1, 1)
    bpf = jnp.sum(mask * bits) / (mask.shape[0] * mask.shape[2])
    return float(bpf)


def cal_entropy(bincount_list: List[np.ndarray]):
    """Per-codebook usage entropy (bits) + pct of capacity
    (reference: models/utils.py:76-88)."""
    entropy_list, pct_list = [], []
    for counts in bincount_list:
        counts = np.asarray(counts, dtype=np.float64)
        bit = math.ceil(math.log2(counts.shape[0]))
        p = np.clip(counts / counts.sum(), 1e-10, None)
        entropy = float(-(p * np.log(p)).sum() * np.log2(np.e))
        entropy_list.append(entropy)
        pct_list.append(entropy / bit)
    return entropy_list, pct_list


def codebook_usage(codes, codebook_size: int) -> List[np.ndarray]:
    """codes (B, Nq, T) -> list of per-stage bincounts."""
    codes = np.asarray(codes)
    return [
        np.bincount(codes[:, i].reshape(-1), minlength=codebook_size)
        for i in range(codes.shape[1])
    ]


def _pair(recons, signal):
    r = np.asarray(recons.audio_data if isinstance(recons, Signal) else recons)
    s = np.asarray(signal.audio_data if isinstance(signal, Signal) else signal)
    return r.astype(np.float64), s.astype(np.float64)


def si_sdr(recons, signal, zero_mean: bool = True) -> float:
    """Scale-invariant SDR (dB), torchmetrics convention (estimate first)."""
    est, ref = _pair(recons, signal)
    est = est.reshape(est.shape[0], -1)
    ref = ref.reshape(ref.shape[0], -1)
    if zero_mean:
        est = est - est.mean(-1, keepdims=True)
        ref = ref - ref.mean(-1, keepdims=True)
    eps = np.finfo(np.float64).eps
    alpha = (np.sum(est * ref, -1, keepdims=True) + eps) / (
        np.sum(ref ** 2, -1, keepdims=True) + eps
    )
    target = alpha * ref
    noise = est - target
    val = (np.sum(target ** 2, -1) + eps) / (np.sum(noise ** 2, -1) + eps)
    return float(np.mean(10.0 * np.log10(val)))


def si_snr(recons, signal) -> float:
    return si_sdr(recons, signal, zero_mean=True)


def snr(recons, signal, zero_mean: bool = False) -> float:
    est, ref = _pair(recons, signal)
    est = est.reshape(est.shape[0], -1)
    ref = ref.reshape(ref.shape[0], -1)
    if zero_mean:
        est = est - est.mean(-1, keepdims=True)
        ref = ref - ref.mean(-1, keepdims=True)
    eps = np.finfo(np.float64).eps
    val = (np.sum(ref ** 2, -1) + eps) / (np.sum((ref - est) ** 2, -1) + eps)
    return float(np.mean(10.0 * np.log10(val)))


def sdr(recons, signal, filter_length: int = 512,
        zero_mean: bool = False, load_diag: Optional[float] = None) -> float:
    """BSS-eval-style signal-to-distortion ratio with an FIR distortion
    filter (the single-source torchmetrics ``SignalDistortionRatio`` the
    reference dispatches at models/utils.py:91-143).

    The reference signal may be filtered by the best ``filter_length``-tap
    FIR filter h before comparison:

        h* = argmin_h ||est - ref * h||^2   (Toeplitz normal equations)
        SDR = 10 log10(||ref * h*||^2 / ||est - ref * h*||^2)

    Unlike ``si_sdr`` (a pure gain), this forgives linear filtering —
    e.g. a delayed or EQ'd but otherwise perfect estimate scores high SDR
    but low SI-SDR.
    """
    from scipy.linalg import solve_toeplitz

    est, ref = _pair(recons, signal)
    est = est.reshape(-1, est.shape[-1])
    ref = ref.reshape(-1, ref.shape[-1])
    if np.abs(est).max() == 0 or np.abs(ref).max() == 0:
        return float("nan")
    if zero_mean:
        est = est - est.mean(-1, keepdims=True)
        ref = ref - ref.mean(-1, keepdims=True)

    n = est.shape[-1]
    n_fft = 1 << int(math.ceil(math.log2(2 * n - 1)))
    vals = []
    for e, s in zip(est, ref):
        s_f = np.fft.rfft(s, n_fft)
        e_f = np.fft.rfft(e, n_fft)
        # autocorrelation of the reference and cross-correlation ref->est,
        # first filter_length lags (linear, thanks to the zero padding)
        acf = np.fft.irfft(np.abs(s_f) ** 2, n_fft)[:filter_length]
        xcorr = np.fft.irfft(np.conj(s_f) * e_f, n_fft)[:filter_length]
        if load_diag is not None:
            acf = acf.copy()
            acf[0] += load_diag
        h = solve_toeplitz(acf, xcorr)
        # ||ref*h||^2 = c.h (orthogonal projection), residual = ||e||^2 - c.h
        proj = float(np.dot(xcorr, h))
        energy = float(np.dot(e, e))
        eps = np.finfo(np.float64).eps
        ratio = proj / max(energy - proj, eps)
        vals.append(10.0 * np.log10(max(ratio, eps)))
    return float(np.mean(vals))


def l1(recons, signal) -> float:
    est, ref = _pair(recons, signal)
    return float(np.mean(np.abs(est - ref)))


def nsim(recons, signal, sample_rate: int = 44100, speech: bool = False) -> float:
    """ViSQOL neurogram similarity (vnsim) between two signals, in [0, 1].

    The reference shells out to the Google visqol binary via audiotools
    (models/utils.py:130-141); that binary is unavailable here, so
    ``vrvq_tpu.visqol`` implements the published pipeline directly
    (ERB-spaced gammatone spectrogram, 30-frame silence-gated patches,
    max-NSIM patch alignment, Gaussian-window luminance*structure). This
    returns the mean patch NSIM; ``visqol.nsim_to_mos`` maps it to a
    documented-but-uncalibrated MOS stand-in (the binary's trained SVR is
    the one piece that cannot be reproduced without its model file).
    """
    return _visqol_batch(recons, signal, sample_rate, speech)[0]


def _visqol_batch(recons, signal, sample_rate: int = 44100,
                  speech: bool = False) -> tuple:
    """(mean vnsim, mean per-item MOS) over the batch. MOS is averaged
    per item (the listening-test convention) rather than mapping the mean
    vnsim — the logistic is steep enough that the two diverge on
    mixed-quality batches."""
    from .visqol import visqol as _visqol

    est, ref = _pair(recons, signal)
    vs, moss = [], []
    for e, r in zip(est.reshape(-1, est.shape[-1]),
                    ref.reshape(-1, ref.shape[-1])):
        v, m = _visqol(e, r, sample_rate, speech=speech)
        vs.append(v)
        moss.append(m)
    return float(np.mean(vs)), float(np.mean(moss))


def cal_metrics(recons, signal, state=None, loss_fn: str = "mel") -> float:
    """Metric dispatch (reference: models/utils.py:91-143). ``state`` (a
    train State or any object with mel/stft/waveform loss attrs) is only
    needed for the loss-based metrics."""
    if loss_fn == "mel":
        return float(state.mel_loss(recons, signal))
    if loss_fn == "stft":
        return float(state.stft_loss(recons, signal))
    if loss_fn == "waveform":
        return float(state.waveform_loss(recons, signal))
    if loss_fn == "SDR":
        return sdr(recons, signal)
    if loss_fn == "SI-SDR":
        return si_sdr(recons, signal)
    if loss_fn == "SI-SNR":
        return si_snr(recons, signal)
    if loss_fn == "SNR":
        return snr(recons, signal)
    if loss_fn == "L1":
        return l1(recons, signal)
    if loss_fn == "ViSQOL":
        return nsim(recons, signal, speech=False)
    if loss_fn == "ViSQOL-speech":
        return nsim(recons, signal, speech=True)
    if loss_fn == "ViSQOL-MOS":
        return _visqol_batch(recons, signal, speech=False)[1]
    raise ValueError(f"Unknown loss function: {loss_fn}")


def mean_std(data):
    """NaN-safe mean/std (reference: models/utils.py:146-150)."""
    data = np.asarray(data, dtype=np.float64)
    data = data[~np.isnan(data)]
    return float(np.mean(data)), float(np.std(data))
