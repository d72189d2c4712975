"""Tests for the host data pipeline: IO, collation, rasterization, loaders."""

import os

import numpy as np
import pytest

from timbre_trap_tpu.data import (
    AudioDataset,
    ComboDataset,
    DataLoader,
    MPEDataset,
    StemMixingDataset,
    constants,
    default_collate,
    separate_ground_truth,
)
from timbre_trap_tpu.data.io import load_audio, load_notes_midi, save_wav
from timbre_trap_tpu.data.note import NoteDataset
from timbre_trap_tpu.data.pitch import PitchDataset
from timbre_trap_tpu.transform.design import midi_to_hz


# --------------------------------------------------------------------- #
# IO                                                                    #
# --------------------------------------------------------------------- #

def test_wav_round_trip(tmp_path, rng):
    path = str(tmp_path / "t.wav")
    audio = 0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000)
    save_wav(path, audio.astype(np.float32), 8000)
    loaded, fs = load_audio(path, sample_rate=8000, normalize=False)
    assert fs == 8000 and loaded.shape == (1, 8000)
    assert np.allclose(loaded[0], audio, atol=1e-3)


def test_wav_resample_and_normalize(tmp_path):
    path = str(tmp_path / "t.wav")
    audio = 0.25 * np.sin(2 * np.pi * 220 * np.arange(16000) / 16000)
    save_wav(path, audio.astype(np.float32), 16000)
    loaded, fs = load_audio(path, sample_rate=8000)
    assert fs == 8000
    assert abs(loaded.shape[-1] - 8000) <= 1
    assert np.abs(loaded).max() == pytest.approx(1.0, abs=1e-6)  # inf-norm


def test_unsupported_format(tmp_path):
    # mp3 is natively supported now (data/io/native.py); ogg remains gated.
    path = str(tmp_path / "t.ogg")
    open(path, "wb").write(b"OggS\x00")
    with pytest.raises(ValueError):
        load_audio(path)
    bad_mp3 = str(tmp_path / "t.mp3")
    open(bad_mp3, "wb").write(b"\xff\xfb")
    with pytest.raises((ValueError, RuntimeError)):
        load_audio(bad_mp3)


# --------------------------------------------------------------------- #
# MIDI                                                                  #
# --------------------------------------------------------------------- #

def _varlen(n):
    out = [n & 0x7F]
    n >>= 7
    while n:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    return bytes(reversed(out))


def _write_midi(path, events, ticks_per_beat=480):
    """events: list of (delta_ticks, raw message bytes)."""
    track = b""
    for delta, msg in events:
        track += _varlen(delta) + msg
    track += _varlen(0) + bytes([0xFF, 0x2F, 0x00])  # end of track
    header = b"MThd" + (6).to_bytes(4, "big") + (0).to_bytes(2, "big") \
        + (1).to_bytes(2, "big") + ticks_per_beat.to_bytes(2, "big")
    chunk = b"MTrk" + len(track).to_bytes(4, "big") + track
    with open(path, "wb") as fh:
        fh.write(header + chunk)


def test_midi_basic_notes(tmp_path):
    path = str(tmp_path / "t.mid")
    # tempo 500000 us/beat, 480 tpb -> 1 tick = 1/960 s
    _write_midi(path, [
        (0, bytes([0xFF, 0x51, 0x03, 0x07, 0xA1, 0x20])),  # tempo 500000
        (0, bytes([0x90, 60, 100])),     # C4 on at t=0
        (480, bytes([0x80, 60, 0])),     # C4 off at 0.5 s
        (0, bytes([0x90, 64, 90])),      # E4 on at 0.5 s
        (960, bytes([0x90, 64, 0])),     # E4 off (note-on vel 0) at 1.5 s
    ])
    pitches, velocities, intervals = load_notes_midi(path)
    assert list(pitches) == [60, 64]
    assert list(velocities) == [100, 90]
    assert intervals[0] == pytest.approx([0.0, 0.5])
    assert intervals[1] == pytest.approx([0.5, 1.5])


def test_midi_sustain_extension(tmp_path):
    path = str(tmp_path / "t.mid")
    _write_midi(path, [
        (0, bytes([0x90, 60, 100])),      # on at 0
        (240, bytes([0xB0, 64, 127])),    # sustain down at 0.25
        (240, bytes([0x80, 60, 0])),      # off at 0.5 (sustained!)
        (480, bytes([0xB0, 64, 0])),      # sustain up at 1.0
        (480, bytes([0x90, 62, 50])),     # later event
        (0, bytes([0x80, 62, 0])),
    ])
    pitches, _, intervals = load_notes_midi(path)
    # First note's offset extends to the sustain release at 1.0 s.
    assert intervals[0] == pytest.approx([0.0, 1.0])


def test_midi_tempo_change(tmp_path):
    path = str(tmp_path / "t.mid")
    _write_midi(path, [
        (0, bytes([0x90, 60, 100])),
        (480, bytes([0xFF, 0x51, 0x03, 0x0F, 0x42, 0x40])),  # tempo 1000000
        (480, bytes([0x80, 60, 0])),      # 0.5 s + 1.0 s = 1.5 s
    ])
    _, _, intervals = load_notes_midi(path)
    assert intervals[0] == pytest.approx([0.0, 1.5])


def test_midi_running_status(tmp_path):
    path = str(tmp_path / "t.mid")
    # second note uses running status (no status byte)
    track_events = [
        (0, bytes([0x90, 60, 100])),
        (0, bytes([64, 100])),           # running 0x90: E4 on
        (480, bytes([0x80, 60, 0])),
        (0, bytes([64, 0])),             # running 0x80: E4 off
    ]
    _write_midi(path, track_events)
    pitches, _, intervals = load_notes_midi(path)
    assert sorted(pitches) == [60, 64]


# --------------------------------------------------------------------- #
# Collation                                                             #
# --------------------------------------------------------------------- #

def test_default_collate(rng):
    samples = [{"track": f"t{i}", "audio": rng.standard_normal((1, 10))}
               for i in range(3)]
    batch = default_collate(samples)
    assert batch["track"] == ["t0", "t1", "t2"]
    assert batch["audio"].shape == (3, 1, 10)


def test_separate_ground_truth(rng):
    both = {constants.KEY_TRACK: "a", constants.KEY_AUDIO: np.zeros((1, 4)),
            constants.KEY_GROUND_TRUTH: np.zeros((3, 2)),
            constants.KEY_TIMES: np.zeros(2)}
    audio_only = {constants.KEY_TRACK: "b", constants.KEY_AUDIO: np.zeros((1, 4))}
    b, a, s = separate_ground_truth([both, audio_only])
    assert b[constants.KEY_AUDIO].shape == (1, 1, 4)
    assert a[constants.KEY_TRACK] == ["b"]
    assert s is None


# --------------------------------------------------------------------- #
# Synthetic datasets                                                    #
# --------------------------------------------------------------------- #

class _ToyAudio(AudioDataset):
    @staticmethod
    def available_splits():
        return ["all"]

    def get_tracks(self, split):
        return sorted(os.path.splitext(f)[0] for f in os.listdir(self.base_dir)
                      if f.endswith(".wav"))

    def get_audio_path(self, track):
        return os.path.join(self.base_dir, f"{track}.wav")


class _ToyMPE(MPEDataset, _ToyAudio):
    def get_tracks(self, split):
        return _ToyAudio.get_tracks(self, split)

    def get_audio_path(self, track):
        return _ToyAudio.get_audio_path(self, track)

    def get_ground_truth_path(self, track):
        return os.path.join(self.base_dir, f"{track}.f0.npy")

    def get_ground_truth(self, track):
        data = np.load(self.get_ground_truth_path(track), allow_pickle=True).item()
        return data["times"], [np.asarray(p) for p in data["pitches"]]


@pytest.fixture()
def toy_dataset_dir(tmp_path, small_cqt):
    sr = small_cqt.sample_rate
    for i, midi in enumerate([60.0, 64.0, 67.0]):
        f = float(midi_to_hz(midi))
        n = int(1.5 * sr)
        audio = 0.5 * np.sin(2 * np.pi * f * np.arange(n) / sr)
        save_wav(str(tmp_path / f"tr{i}.wav"), audio.astype(np.float32), sr)
        times = np.arange(0, 1.5, 0.01)
        pitches = [np.array([f])] * len(times)
        np.save(str(tmp_path / f"tr{i}.f0.npy"),
                {"times": times, "pitches": pitches})
    return str(tmp_path)


def test_mpe_dataset_getitem(toy_dataset_dir, small_cqt):
    ds = _ToyMPE(base_dir=toy_dataset_dir, splits=["all"],
                 sample_rate=small_cqt.sample_rate, cqt=small_cqt,
                 n_secs=1.0, seed=3)
    assert len(ds) == 3
    data = ds[0]
    n_samples = small_cqt.get_expected_samples(1.0)
    n_frames = small_cqt.get_expected_frames(n_samples)
    assert data[constants.KEY_AUDIO].shape == (1, n_samples)
    assert data[constants.KEY_GROUND_TRUTH].shape == (small_cqt.n_bins, n_frames)
    # ground truth must contain exact 1.0 at annotated bins
    gt = data[constants.KEY_GROUND_TRUTH]
    assert gt.max() == pytest.approx(1.0)
    # annotated pitch is C4 (midi 60): peak row should be the nearest bin
    peak_bin = np.argmax(gt.sum(axis=-1))
    expected_bin = np.argmin(np.abs(small_cqt.midi_freqs - 60.0))
    assert abs(int(peak_bin) - int(expected_bin)) <= 1


def test_mpe_dataset_full_track(toy_dataset_dir, small_cqt):
    ds = _ToyMPE(base_dir=toy_dataset_dir, splits=["all"],
                 sample_rate=small_cqt.sample_rate, cqt=small_cqt,
                 n_secs=None, seed=3)
    data = ds[1]
    frames = data[constants.KEY_GROUND_TRUTH].shape[-1]
    assert frames == len(data[constants.KEY_TIMES])


def test_combo_and_loader(toy_dataset_dir, small_cqt):
    ds = _ToyMPE(base_dir=toy_dataset_dir, splits=["all"],
                 sample_rate=small_cqt.sample_rate, cqt=small_cqt,
                 n_secs=1.0, seed=0)
    combo = ComboDataset([ds, ds])
    assert len(combo) == 6
    loader = DataLoader(combo, batch_size=4, shuffle=True, drop_last=True, seed=1)
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0][constants.KEY_AUDIO].shape[0] == 4


def test_loader_threaded_matches_serial(toy_dataset_dir, small_cqt):
    ds = _ToyMPE(base_dir=toy_dataset_dir, splits=["all"],
                 sample_rate=small_cqt.sample_rate, cqt=small_cqt,
                 n_secs=None, seed=0)
    serial = list(DataLoader(ds, batch_size=1, num_workers=0))
    threaded = list(DataLoader(ds, batch_size=1, num_workers=2))
    assert [b[constants.KEY_TRACK] for b in serial] == \
           [b[constants.KEY_TRACK] for b in threaded]


def test_stem_mixing(toy_dataset_dir, small_cqt):
    ds = _ToyMPE(base_dir=toy_dataset_dir, splits=["all"],
                 sample_rate=small_cqt.sample_rate, cqt=small_cqt,
                 n_secs=1.0, seed=0)
    mix = StemMixingDataset([ds], tracks_per_epoch=4, n_min=2, n_max=3, seed=7)
    assert len(mix) == 4
    data = mix[0]
    assert data[constants.KEY_AUDIO].shape[-1] == \
        small_cqt.get_expected_samples(1.0)
    assert data[constants.KEY_GROUND_TRUTH].max() <= 1.0


# --------------------------------------------------------------------- #
# Rasterization corner cases                                            #
# --------------------------------------------------------------------- #

def test_multi_pitch_to_activations_blur(small_cqt):
    freqs = small_cqt.get_midi_freqs()
    f = float(midi_to_hz(freqs[10]))
    acts = PitchDataset.multi_pitch_to_activations(
        [np.array([f]), np.array([])], freqs)
    assert acts.shape == (len(freqs), 2)
    assert acts[10, 0] == pytest.approx(1.0)  # GT bin renormalized to 1
    assert acts[9, 0] > 0 and acts[11, 0] > 0  # blur spreads
    assert acts[:, 1].sum() == 0.0


def test_multi_pitch_out_of_bounds_warns(small_cqt):
    freqs = small_cqt.get_midi_freqs()
    with pytest.warns(RuntimeWarning):
        acts = PitchDataset.multi_pitch_to_activations(
            [np.array([5.0])], freqs)  # 5 Hz below range
    assert acts.sum() == 0.0


def test_activations_multi_pitch_round_trip(small_cqt):
    freqs = small_cqt.get_midi_freqs()
    acts = np.zeros((len(freqs), 3))
    acts[20, 0] = 0.9
    acts[40, 2] = 0.7
    mp = PitchDataset.activations_to_multi_pitch(acts, freqs, peaks_only=True)
    assert len(mp[0]) == 1 and len(mp[1]) == 0 and len(mp[2]) == 1
    assert mp[0][0] == pytest.approx(float(midi_to_hz(freqs[20])))


def test_notes_to_multi_pitch():
    times = np.array([0.0, 0.5, 1.0, 1.5])
    pitches = np.array([440.0])
    intervals = np.array([[0.4, 1.2]])
    mp = NoteDataset.notes_to_multi_pitch(pitches, intervals, times)
    assert len(mp[0]) == 0
    assert mp[1][0] == 440.0 and mp[2][0] == 440.0
    assert len(mp[3]) == 0
