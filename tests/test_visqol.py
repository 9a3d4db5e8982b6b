"""ViSQOL-style gammatone NSIM (vrvq_tpu/visqol.py).

The reference's quality metric is the external visqol binary
(reference: models/utils.py:130-141); these tests pin the in-tree
implementation's algorithmic properties: ERB filterbank shape, quality
ordering, patch-alignment shift robustness, and the MOS mapping.
"""

import numpy as np
import pytest

from vrvq_tpu.visqol import (
    gammatone_weights, gammatonegram, nsim_to_mos, patch_nsim, visqol,
)

SR = 44100


def _tone(freqs, seconds=2.0, amp=0.4):
    t = np.arange(int(seconds * SR)) / SR
    x = sum(amp * np.sin(2 * np.pi * f * t) / (i + 1)
            for i, f in enumerate(np.atleast_1d(freqs)))
    return x.astype(np.float32)


def test_gammatone_weights_shape_and_centers():
    w, centers = gammatone_weights(32, 50.0, SR, 4096)
    assert w.shape == (32, 2049)
    # ERB-spaced centers are increasing and span the band
    assert np.all(np.diff(centers) > 0)
    assert centers[0] == pytest.approx(50.0, rel=1e-6)
    assert centers[-1] > 15000
    # each band peaks (by construction) at 1 near its center bin
    freqs = np.fft.rfftfreq(4096, 1.0 / SR)
    for i in (0, 15, 31):
        peak_f = freqs[np.argmax(w[i])]
        assert abs(peak_f - centers[i]) <= freqs[1] * 2


def test_gammatonegram_shape():
    g = gammatonegram(_tone(440), SR)
    win, hop = int(0.08 * SR), int(0.02 * SR)
    assert g.shape == (32, 1 + (int(2.0 * SR) - win) // hop)
    # a 440 Hz tone concentrates energy in low bands
    assert g[:8].max() > g[24:].max() + 10.0


def test_visqol_quality_ordering():
    ref = _tone([220, 440, 880])
    rng = np.random.RandomState(3)
    v_same, mos_same = visqol(ref, ref, SR)
    v_slight, _ = visqol(ref + 0.003 * rng.randn(ref.size).astype(np.float32),
                         ref, SR)
    v_heavy, mos_heavy = visqol(ref + 0.3 * rng.randn(ref.size).astype(np.float32),
                                ref, SR)
    assert v_same > 0.999
    assert v_same >= v_slight > v_heavy
    assert mos_same > 4.5 > mos_heavy


def test_patch_alignment_shift_robustness():
    """A small time offset barely hurts the score thanks to per-patch
    alignment (the property the visqol binary's alignment stage provides;
    a naive whole-signal NSIM collapses under the same shift)."""
    ref = _tone([330, 660]) * (1 + 0.5 * np.sin(
        2 * np.pi * 1.3 * np.arange(int(2.0 * SR)) / SR)).astype(np.float32)
    shift = int(0.05 * SR)  # 50 ms = 2.5 hops
    deg = np.concatenate([np.zeros(shift, np.float32), ref[:-shift]])
    v_aligned, _ = visqol(deg, ref, SR)
    naive = patch_nsim(gammatonegram(ref, SR), gammatonegram(deg, SR))
    assert v_aligned > 0.95
    assert v_aligned > naive


def test_speech_mode_band_count():
    g = gammatonegram(_tone(200, seconds=1.0), SR, n_bands=21)
    assert g.shape[0] == 21
    v, _ = visqol(_tone(200, seconds=1.0), _tone(200, seconds=1.0), SR,
                  speech=True)
    assert v > 0.999


def test_nsim_to_mos_monotone_and_range():
    vs = np.linspace(0.0, 1.0, 21)
    mos = [nsim_to_mos(v) for v in vs]
    assert all(b >= a for a, b in zip(mos, mos[1:]))
    assert 1.0 <= mos[0] < 1.2
    assert 4.5 < mos[-1] < 5.0


def test_metrics_nsim_delegates():
    from vrvq_tpu.metrics import cal_metrics, nsim

    ref = _tone(440, seconds=1.0)[None, None]
    assert nsim(ref, ref) > 0.999
    assert cal_metrics(ref, ref, loss_fn="ViSQOL-MOS") > 4.5


def test_silent_reference_falls_back():
    """A silent reference must not sail through the patch path: the
    absolute -60 dB activity floor leaves no active frames, so the
    whole-signal fallback runs; silence-vs-noise scores low."""
    z = np.zeros(SR, np.float32)
    v, mos = visqol(z, z, SR)
    assert 0.0 <= v <= 1.0 and 1.0 <= mos <= 5.0
    rng = np.random.RandomState(0)
    noise = 0.1 * rng.randn(SR).astype(np.float32)
    v_noise, mos_noise = visqol(noise, z, SR)
    assert v_noise < 0.8 and mos_noise < 3.0


def _music_like(seed, secs=6.0):
    """Full-band music-like anchor signal: harmonic voices with vibrato +
    transients + broadband noise (the calibration-protocol signal,
    vrvq_tpu/visqol.py DEFAULT_NSIM_MOS_ANCHORS)."""
    r = np.random.RandomState(seed)
    t = np.arange(int(secs * SR)) / SR
    x = np.zeros_like(t)
    for f0 in (110, 220, 330, 523, 880):
        ph = r.rand() * 6.28
        vib = 1 + 0.003 * np.sin(2 * np.pi * 5 * t + r.rand() * 6)
        for h in range(1, 9):
            x += (0.3 / h) * np.sin(2 * np.pi * f0 * h * vib * t + ph * h)
    x *= 0.5 + 0.5 * np.sin(2 * np.pi * 0.7 * t + r.rand())
    x += 0.05 * r.randn(t.size)
    for _ in range(12):
        p = int(r.rand() * (t.size - 2000))
        x[p:p + 1500] += (np.hanning(1500) * 0.8 * r.randn(1500)
                          * np.exp(-np.arange(1500) / 300))
    return (0.3 * x / np.abs(x).max()).astype(np.float64)


def _lowpass(x, cutoff):
    from scipy.signal import firwin, filtfilt

    return filtfilt(firwin(513, cutoff / (SR / 2)), [1.0], x)


def test_mos_calibration_reproduces_anchor_conditions():
    """Known-quality pairs: regenerate the calibration protocol's anchor
    conditions and check the mapped MOS lands in the documented subjective
    range for each (MUSHRA low/mid anchors per ITU-R BS.1534; ceiling per
    ViSQOL v3's documented 4.732 maximum)."""
    ref = _music_like(1)
    assert nsim_to_mos(visqol(ref, ref, SR)[0]) == pytest.approx(4.732, abs=0.01)
    mos_7k = nsim_to_mos(visqol(_lowpass(ref, 7000), ref, SR)[0])
    assert 3.0 < mos_7k < 3.6, f"7 kHz LP (MUSHRA mid anchor): {mos_7k}"
    mos_35 = nsim_to_mos(visqol(_lowpass(ref, 3500), ref, SR)[0])
    assert 1.7 < mos_35 < 2.3, f"3.5 kHz LP (MUSHRA low anchor): {mos_35}"
    mos_15 = nsim_to_mos(visqol(_lowpass(ref, 1500), ref, SR)[0])
    assert 1.0 <= mos_15 < 1.6, f"1.5 kHz LP: {mos_15}"
    assert mos_15 < mos_35 < mos_7k


def test_fit_nsim_mos_recalibration():
    """fit_nsim_mos builds a usable anchor table from noisy, unsorted,
    non-monotone (nsim, mos) observations (e.g. official-binary scores)."""
    from vrvq_tpu.visqol import fit_nsim_mos

    pairs = [(0.9, 4.2), (0.7, 2.9), (0.8, 3.6), (0.75, 3.65),  # violator
             (0.5, 1.6), (0.9, 4.3)]
    table = fit_nsim_mos(pairs)
    xs = [p[0] for p in table]
    ys = [p[1] for p in table]
    assert xs == sorted(xs) and ys == sorted(ys)
    assert table[0] == (0.0, 1.0) and table[-1] == (1.0, 4.732)
    # mapping through the custom table is monotone and interpolates
    grid = [nsim_to_mos(v, anchors=table) for v in np.linspace(0, 1, 31)]
    assert all(b >= a - 1e-9 for a, b in zip(grid, grid[1:]))
    assert nsim_to_mos(0.9, anchors=table) == pytest.approx(4.25, abs=0.01)


def test_mos_is_per_item_mean():
    """cal_metrics ViSQOL-MOS averages per-item MOS, not MOS of the mean
    vnsim (they diverge on mixed-quality batches under the steep logistic)."""
    from vrvq_tpu.metrics import _visqol_batch
    from vrvq_tpu.visqol import nsim_to_mos

    rng = np.random.RandomState(5)
    ref = np.stack([_tone(440), _tone(440)])[:, None]
    deg = ref.copy()
    deg[1] += 0.5 * rng.randn(*deg[1].shape).astype(np.float32)
    v_mean, mos_mean = _visqol_batch(deg, ref)
    assert mos_mean != pytest.approx(nsim_to_mos(v_mean), abs=1e-6)
