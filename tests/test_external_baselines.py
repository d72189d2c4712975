"""Tests for the external comparison baselines (Basic-Pitch, Deep-Salience).

Basic-Pitch runs for real against a stub TF SavedModel (the runner needs
only a ``contour`` output), validating windowing/stitching/frame-time math;
the unavailability paths are tested directly and through the CLI flags.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from timbre_trap_tpu.eval.external import (BP_FFT_HOP, BP_MIDI_FREQS,
                                           BP_SAMPLE_RATE,
                                           ExternalBaselineUnavailable,
                                           load_basic_pitch,
                                           load_deep_salience)

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _make_stub_saved_model(path, hot_bin):
    tf = pytest.importorskip("tensorflow")

    class Stub(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec([None, 43844, 1], tf.float32)])
        def __call__(self, x):
            w = tf.shape(x)[0]
            frames = 43844 // 256
            contour = tf.one_hot(tf.fill([w, frames], hot_bin), 264)
            return {"contour": contour,
                    "note": contour[:, :, :88],
                    "onset": contour[:, :, :88]}

    tf.saved_model.save(Stub(), path)


def test_basic_pitch_runner_stitching(tmp_path):
    hot_bin = 117  # MIDI 60 on the Basic-Pitch grid: (60 - 21) * 3
    assert BP_MIDI_FREQS[hot_bin] == pytest.approx(60.0)
    path = str(tmp_path / "bp_model")
    _make_stub_saved_model(path, hot_bin)

    estimate = load_basic_pitch(path)
    n = int(3.0 * BP_SAMPLE_RATE)
    audio = np.random.default_rng(0).standard_normal(n).astype(np.float32)
    times, salience = estimate(audio)

    n_frames = int(np.floor(n * (BP_SAMPLE_RATE // BP_FFT_HOP)
                            / BP_SAMPLE_RATE))
    assert salience.shape == (264, n_frames)
    assert len(times) == n_frames
    assert np.all(np.diff(times) > 0)  # drift correction keeps times ordered
    assert times[0] == 0.0
    # The stub is a one-hot emitter: stitching must preserve exactly one
    # active bin per frame, at the hot bin.
    assert np.allclose(salience[hot_bin], 1.0)
    assert np.allclose(salience.sum(axis=0), 1.0)


def test_basic_pitch_unavailable(tmp_path):
    # No path given and no basic_pitch package installed.
    with pytest.raises(ExternalBaselineUnavailable, match="basic_pitch"):
        load_basic_pitch(None)
    # Path given but nothing there.
    with pytest.raises(ExternalBaselineUnavailable, match="not found"):
        load_basic_pitch(str(tmp_path / "missing"))


def test_deep_salience_unavailable(tmp_path):
    # librosa is not installed in this environment -> clean refusal before
    # any download is attempted.
    with pytest.raises(ExternalBaselineUnavailable, match="librosa"):
        load_deep_salience(str(tmp_path))


def test_comparison_cli_flags_skip_cleanly(tmp_path):
    """--basic-pitch/--deep-salience without their dependencies must print a
    SKIP message and leave the native baselines running (exit code 0)."""
    from timbre_trap_tpu.data.io import save_wav
    from timbre_trap_tpu.transform.design import midi_to_hz
    import scipy.io

    sr = 22050
    track = "01-AchGottundHerr"
    d = tmp_path / track
    d.mkdir()
    n_frames = 100
    secs = 0.023 + 0.010 * n_frames + 0.1
    t = np.arange(int(secs * sr)) / sr
    audio = 0.4 * np.sin(2 * np.pi * float(midi_to_hz(60.0)) * t)
    save_wav(str(d / f"{track}.wav"), audio.astype(np.float32), sr)
    gtf0 = np.zeros((4, n_frames))
    gtf0[0, :] = 60.0
    scipy.io.savemat(str(d / f"{track}-GTF0s.mat"), {"GTF0s": gtf0})

    code = (
        "import jax, runpy, sys; "
        "jax.config.update('jax_platforms', 'cpu'); "
        f"sys.argv = ['comparison.py', '--bach10-dir', {str(tmp_path)!r}, "
        "'--basic-pitch', '--deep-salience']; "
        f"runpy.run_path({os.path.join(REPO, 'experiments', 'comparison.py')!r},"
        " run_name='__main__')"
    )
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "[basic-pitch] SKIPPED:" in out.stdout
    assert "[deep-salience] SKIPPED:" in out.stdout
    assert "[Bach10/lin-CQT]" in out.stdout
