"""Tests for the concrete dataset zoo using synthetic corpus fixtures."""

import json
import os

import numpy as np
import pytest
import scipy.io

from timbre_trap_tpu.data import constants
from timbre_trap_tpu.data.io import save_wav
from timbre_trap_tpu.transform.design import midi_to_hz


SR = 8000


@pytest.fixture(scope="module")
def cqt():
    from timbre_trap_tpu.transform import CQT

    return CQT(n_octaves=5, bins_per_octave=12, sample_rate=SR,
               secs_per_block=0.5)


def _tone(midi, secs=1.0):
    f = float(midi_to_hz(midi))
    t = np.arange(int(secs * SR)) / SR
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def _write_midi_simple(path, notes):
    """notes: list of (pitch, onset_s, offset_s); 480 tpb, 500000 us tempo."""
    def varlen(n):
        out = [n & 0x7F]
        n >>= 7
        while n:
            out.append((n & 0x7F) | 0x80)
            n >>= 7
        return bytes(reversed(out))

    events = []
    for p, on, off in notes:
        events.append((int(on * 960), bytes([0x90, p, 80])))
        events.append((int(off * 960), bytes([0x80, p, 0])))
    events.sort(key=lambda e: e[0])
    track, last = b"", 0
    for tick, msg in events:
        track += varlen(tick - last) + msg
        last = tick
    track += varlen(0) + bytes([0xFF, 0x2F, 0x00])
    header = b"MThd" + (6).to_bytes(4, "big") + (0).to_bytes(2, "big") \
        + (1).to_bytes(2, "big") + (480).to_bytes(2, "big")
    with open(path, "wb") as fh:
        fh.write(header + b"MTrk" + len(track).to_bytes(4, "big") + track)


# --------------------------------------------------------------------- #
# URMP                                                                  #
# --------------------------------------------------------------------- #

@pytest.fixture()
def urmp_dir(tmp_path):
    track = "01_Jupiter_vn_vc"
    d = tmp_path / track
    d.mkdir()
    save_wav(str(d / f"AuMix_{track}.wav"), _tone(69), SR)
    for i, name in enumerate(["1_vn_01_Jupiter", "2_vc_01_Jupiter"], 0):
        save_wav(str(d / f"AuSep_{name}.wav"), _tone(69 - 12 * i), SR)
        times = np.arange(0, 1.0, 0.01)
        pitch = np.full_like(times, float(midi_to_hz(69 - 12 * i)))
        np.savetxt(str(d / f"F0s_{name}.txt"),
                   np.stack([times, pitch], axis=-1))
    return str(tmp_path)


def test_urmp_mixtures(urmp_dir, cqt):
    from timbre_trap_tpu.data.datasets.MixedMultiPitch import URMP

    ds = URMP(base_dir=urmp_dir, splits=["01"], sample_rate=SR, cqt=cqt,
              n_secs=None)
    assert ds.tracks == ["01_Jupiter_vn_vc"]
    data = ds[0]
    assert data[constants.KEY_AUDIO].shape[0] == 1
    gt = data[constants.KEY_GROUND_TRUTH]
    assert gt.shape[0] == cqt.n_bins
    # Two simultaneous pitches (A4 + A3) -> two active bins per frame region
    active_bins = np.where(gt.max(axis=-1) == 1.0)[0]
    assert len(active_bins) == 2


def test_urmp_stems(urmp_dir, cqt):
    from timbre_trap_tpu.data.datasets.SoloMultiPitch import URMP

    ds = URMP(base_dir=urmp_dir, splits=["01"], sample_rate=SR, cqt=cqt,
              n_secs=None)
    assert sorted(ds.tracks) == [
        "01_Jupiter_vn_vc/1_vn_01_Jupiter",
        "01_Jupiter_vn_vc/2_vc_01_Jupiter"]
    data = ds[0]
    gt = data[constants.KEY_GROUND_TRUTH]
    assert (gt.max(axis=-1) == 1.0).sum() == 1  # one pitch per stem


# --------------------------------------------------------------------- #
# Bach10                                                                #
# --------------------------------------------------------------------- #

@pytest.fixture()
def bach10_dir(tmp_path):
    track = "01-AchGottundHerr"
    d = tmp_path / track
    d.mkdir()
    save_wav(str(d / f"{track}.wav"), _tone(60), SR)
    n_frames = 80
    gtf0 = np.zeros((4, n_frames))
    gtf0[0, :] = 69.0  # violin holds A4
    gtf0[3, 10:50] = 45.0  # bassoon
    scipy.io.savemat(str(d / f"{track}-GTF0s.mat"), {"GTF0s": gtf0})
    for ins in ["violin", "clarinet", "saxphone", "bassoon"]:
        save_wav(str(d / f"{track}-{ins}.wav"), _tone(60), SR)
    return str(tmp_path)


def test_bach10_mixtures(bach10_dir, cqt):
    from timbre_trap_tpu.data.datasets.MixedMultiPitch import Bach10

    ds = Bach10(base_dir=bach10_dir, splits=["01"], sample_rate=SR, cqt=cqt)
    times, pitches = ds.get_ground_truth(ds.tracks[0])
    assert times[0] == pytest.approx(0.023)
    assert len(pitches[0]) == 1  # only violin at frame 0
    assert len(pitches[20]) == 2  # violin + bassoon
    assert pitches[0][0] == pytest.approx(440.0, rel=1e-3)


def test_bach10_stems(bach10_dir, cqt):
    from timbre_trap_tpu.data.datasets.SoloMultiPitch import Bach10

    ds = Bach10(base_dir=bach10_dir, splits=["01"], sample_rate=SR, cqt=cqt)
    assert len(ds.tracks) == 4
    violin = [t for t in ds.tracks if t.endswith("violin")][0]
    _, pitches = ds.get_ground_truth(violin)
    assert all(len(p) == 1 for p in pitches)


# --------------------------------------------------------------------- #
# Su                                                                    #
# --------------------------------------------------------------------- #

def test_su(tmp_path, cqt):
    from timbre_trap_tpu.data.datasets.MixedMultiPitch import Su

    (tmp_path / "audio").mkdir()
    (tmp_path / "gt_Note").mkdir()
    save_wav(str(tmp_path / "audio" / "PQ02_audio.wav"), _tone(60, 2.0), SR)
    np.savetxt(str(tmp_path / "gt_Note" / "PQ02_note.txt"),
               np.array([[0.1, 0.9, 440.0], [1.0, 1.8, 220.0]]))
    ds = Su(base_dir=str(tmp_path), splits=["PQ02"], sample_rate=SR, cqt=cqt)
    pitches, intervals = ds.get_ground_truth("PQ02")
    assert pitches[0] == pytest.approx(69.0)
    assert pitches[1] == pytest.approx(57.0)
    assert intervals[0] == pytest.approx([0.1, 0.9])
    data = ds[0]
    assert data[constants.KEY_GROUND_TRUTH].shape[0] == cqt.n_bins


# --------------------------------------------------------------------- #
# TRIOS                                                                 #
# --------------------------------------------------------------------- #

@pytest.fixture()
def trios_dir(tmp_path):
    d = tmp_path / "mozart"
    d.mkdir()
    save_wav(str(d / "mix.wav"), _tone(60, 2.0), SR)
    save_wav(str(d / "piano.wav"), _tone(60, 2.0), SR)
    save_wav(str(d / "violin.wav"), _tone(69, 2.0), SR)
    save_wav(str(d / "drums.wav"), _tone(40, 2.0), SR)
    _write_midi_simple(str(d / "piano.mid"), [(60, 0.0, 1.0)])
    _write_midi_simple(str(d / "violin.mid"), [(69, 0.5, 1.5)])
    _write_midi_simple(str(d / "drums.mid"), [(36, 0.0, 0.2)])  # unpitched
    return str(tmp_path)


def test_trios_mixtures(trios_dir, cqt):
    from timbre_trap_tpu.data.datasets.MixedMultiPitch import TRIOS

    ds = TRIOS(base_dir=trios_dir, splits=["mozart"], sample_rate=SR, cqt=cqt)
    pitches, intervals = ds.get_ground_truth("mozart")
    # drums.mid excluded (not a pitched instrument)
    assert sorted(pitches) == [60.0, 69.0]


def test_trios_stems(trios_dir, cqt):
    from timbre_trap_tpu.data.datasets.SoloMultiPitch import TRIOS

    ds = TRIOS(base_dir=trios_dir, splits=["mozart"], sample_rate=SR, cqt=cqt)
    assert sorted(os.path.basename(t) for t in ds.tracks) == ["piano", "violin"]


# --------------------------------------------------------------------- #
# MAESTRO                                                               #
# --------------------------------------------------------------------- #

def test_maestro(tmp_path, cqt):
    from timbre_trap_tpu.data.datasets.SoloMultiPitch import MAESTRO

    (tmp_path / "2018").mkdir()
    with open(tmp_path / "maestro-v3.0.0.csv", "w") as fh:
        fh.write("canonical_composer,split,audio_filename,midi_filename\n")
        fh.write("Bach,train,2018/piece.wav,2018/piece.midi\n")
        fh.write("Mozart,test,2018/other.wav,2018/other.midi\n")
    save_wav(str(tmp_path / "2018" / "piece.wav"), _tone(60, 1.0), SR)
    _write_midi_simple(str(tmp_path / "2018" / "piece.midi"), [(60, 0.0, 0.8)])
    ds = MAESTRO(base_dir=str(tmp_path), splits=["train"], sample_rate=SR,
                 cqt=cqt)
    assert ds.tracks == ["2018/piece"]
    pitches, intervals = ds.get_ground_truth("2018/piece")
    assert pitches[0] == 60.0


# --------------------------------------------------------------------- #
# GuitarSet                                                             #
# --------------------------------------------------------------------- #

def test_guitarset(tmp_path, cqt):
    from timbre_trap_tpu.data.datasets.SoloMultiPitch import GuitarSet

    (tmp_path / "annotation").mkdir()
    (tmp_path / "audio_mono-mic").mkdir()
    jam = {
        "file_metadata": {"duration": 1.0},
        "annotations": [
            {"namespace": "pitch_contour",
             "data": [
                 {"time": 0.1, "duration": 0.0,
                  "value": {"frequency": 440.0, "voiced": True, "index": 0}},
                 {"time": 0.2, "duration": 0.0,
                  "value": {"frequency": 0.0, "voiced": False, "index": 0}},
             ]},
            {"namespace": "beat", "data": []},
        ],
    }
    with open(tmp_path / "annotation" / "00_Jazz1-Sw_solo.jams", "w") as fh:
        json.dump(jam, fh)
    save_wav(str(tmp_path / "audio_mono-mic" / "00_Jazz1-Sw_solo_mic.wav"),
             _tone(69, 1.0), SR)
    ds = GuitarSet(base_dir=str(tmp_path), splits=["00"], sample_rate=SR,
                   cqt=cqt)
    assert ds.resample_idcs == [0, 0]
    times, pitches = ds.get_ground_truth("00_Jazz1-Sw_solo")
    hop = 256 / 44100
    frame = int(np.argmin(np.abs(times - 0.1)))
    assert pitches[frame][0] == 440.0
    # unvoiced observation contributes nothing
    assert sum(len(p) for p in pitches) == 1


# --------------------------------------------------------------------- #
# MusicNet                                                              #
# --------------------------------------------------------------------- #

@pytest.fixture()
def musicnet_dir(tmp_path):
    for split in ("train", "test"):
        (tmp_path / f"{split}_data").mkdir()
        (tmp_path / f"{split}_labels").mkdir()
    save_wav(str(tmp_path / "train_data" / "1727.wav"), _tone(60, 1.0), SR)
    with open(tmp_path / "train_labels" / "1727.csv", "w") as fh:
        fh.write("start_time,end_time,instrument,note,start_beat,end_beat,note_value\n")
        fh.write("4410,22050,1,60,0,1,Quarter\n")
        fh.write("22050,44100,1,64,1,2,Quarter\n")
    save_wav(str(tmp_path / "train_data" / "1728.wav"), _tone(64, 1.0), SR)
    with open(tmp_path / "train_labels" / "1728.csv", "w") as fh:
        fh.write("start_time,end_time,instrument,note,start_beat,end_beat,note_value\n")
        fh.write("0,44100,1,60,0,1,Quarter\n")
        fh.write("0,44100,41,64,0,1,Quarter\n")  # second instrument
    return str(tmp_path)


def test_musicnet_mixtures(musicnet_dir, cqt):
    from timbre_trap_tpu.data.datasets.MixedMultiPitch import MusicNet

    ds = MusicNet(base_dir=musicnet_dir, splits=["train"], sample_rate=SR,
                  cqt=cqt)
    assert len(ds.tracks) == 2
    pitches, intervals = ds.get_ground_truth("train/1727")
    assert list(pitches) == [60.0, 64.0]
    assert intervals[0] == pytest.approx([0.1, 0.5])


def test_musicnet_solo_filters_multi_instrument(musicnet_dir, cqt):
    from timbre_trap_tpu.data.datasets.SoloMultiPitch import MusicNet

    ds = MusicNet(base_dir=musicnet_dir, splits=["train"], sample_rate=SR,
                  cqt=cqt)
    assert ds.tracks == ["train/1727"]


# --------------------------------------------------------------------- #
# MedleyDB family                                                       #
# --------------------------------------------------------------------- #

def test_medleydb_mixtures_and_stems(tmp_path):
    from timbre_trap_tpu.data.datasets.AudioMixtures import MedleyDB as Mixes
    from timbre_trap_tpu.data.datasets.AudioStems import MedleyDB as Stems

    song = "ArtistA_SongOne"
    audio_dir = tmp_path / "Audio" / song
    (audio_dir / f"{song}_RAW").mkdir(parents=True)
    meta_dir = tmp_path / "Metadata"
    meta_dir.mkdir()
    save_wav(str(audio_dir / f"{song}_MIX.wav"), _tone(60), SR)
    save_wav(str(audio_dir / f"{song}_RAW" / f"{song}_RAW_01_01.wav"),
             _tone(69), SR)
    metadata = {
        "genre": "Jazz",
        "stems": {"S01": {"filename": f"{song}_STEM_01.wav",
                          "instrument": "piano",
                          "raw": {"R01": {"filename": f"{song}_RAW_01_01.wav",
                                          "instrument": "piano"}}}},
    }
    with open(meta_dir / f"{song}_METADATA.yaml", "w") as fh:
        import yaml

        yaml.safe_dump(metadata, fh)

    mixes = Mixes(base_dir=str(tmp_path), splits=["Jazz"], sample_rate=SR)
    assert mixes.tracks == [song]
    assert os.path.exists(mixes.get_audio_path(song))

    stems = Stems(base_dir=str(tmp_path), splits=["piano"], sample_rate=SR)
    assert stems.tracks == [os.path.join(song, f"{song}_RAW_01_01")]
    assert os.path.exists(stems.get_audio_path(stems.tracks[0]))


def test_medleydb_pitch(tmp_path, cqt):
    from timbre_trap_tpu.data.datasets.SoloMultiPitch import MedleyDB_Pitch

    (tmp_path / "audio").mkdir()
    (tmp_path / "pitch").mkdir()
    with open(tmp_path / "medleydb_pitch_metadata.json", "w") as fh:
        json.dump({"TrackA": {"instrument": "violin"}}, fh)
    save_wav(str(tmp_path / "audio" / "TrackA.wav"), _tone(69), SR)
    np.savetxt(str(tmp_path / "pitch" / "TrackA.csv"),
               np.array([[0.0, 440.0], [0.01, 440.0], [0.02, 0.0]]),
               delimiter=",")
    ds = MedleyDB_Pitch(base_dir=str(tmp_path), splits=["violin"],
                        sample_rate=SR, cqt=cqt)
    assert ds.tracks == ["TrackA"]
    times, pitches = ds.get_ground_truth("TrackA")
    assert len(pitches[0]) == 1 and len(pitches[2]) == 0


def test_medleydb_stem_synth(tmp_path, cqt):
    """Stem-Synth corpus: YAML metadata pruned to available .RESYN stems,
    instrument splits, and F0 CSV parsing (reference
    SoloMultiPitch/MedleyDB_Stem_Synth.py:15-55)."""
    from timbre_trap_tpu.data.datasets.SoloMultiPitch import \
        MedleyDB_Stem_Synth

    song = "ArtistA_SongOne"
    ann = tmp_path / "annotation_stems"
    aud = tmp_path / "audio_stems"
    meta_dir = tmp_path / "Metadata"
    for d in (ann, aud, meta_dir):
        d.mkdir()
    # Only stem 01 is re-synthesized; S02 must be pruned from metadata.
    np.savetxt(str(ann / f"{song}_STEM_01.RESYN.csv"),
               np.array([[0.0, 440.0], [0.01, 440.0], [0.02, 0.0]]),
               delimiter=",")
    save_wav(str(aud / f"{song}_STEM_01.RESYN.wav"), _tone(69), SR)
    metadata = {
        "genre": "Jazz",
        "stems": {
            "S01": {"filename": f"{song}_STEM_01.wav",
                    "instrument": "violin"},
            "S02": {"filename": f"{song}_STEM_02.wav",
                    "instrument": "piano"},
        },
    }
    with open(meta_dir / f"{song}_METADATA.yaml", "w") as fh:
        import yaml

        yaml.safe_dump(metadata, fh)

    ds = MedleyDB_Stem_Synth(base_dir=str(tmp_path), splits=["violin"],
                             sample_rate=SR, cqt=cqt)
    assert list(ds.metadata[song]["stems"].keys()) == ["S01"]  # pruned
    assert ds.tracks == [f"{song}_STEM_01"]
    assert os.path.exists(ds.get_audio_path(ds.tracks[0]))
    times, pitches = ds.get_ground_truth(ds.tracks[0])
    assert len(pitches[0]) == 1 and len(pitches[2]) == 0
    # No violin stems -> empty track list, not an error.
    assert MedleyDB_Stem_Synth(base_dir=str(tmp_path), splits=["piano"],
                               sample_rate=SR, cqt=cqt).tracks == []


# --------------------------------------------------------------------- #
# FMA                                                                   #
# --------------------------------------------------------------------- #

def test_fma_metadata(tmp_path):
    from timbre_trap_tpu.data.datasets import FMA_S

    meta = tmp_path / "fma_metadata"
    meta.mkdir()
    with open(meta / "genres.csv", "w") as fh:
        fh.write("genre_id,#tracks,parent,title,top_level\n")
        fh.write("12,100,0,Rock,12\n")
        fh.write("25,50,12,Punk,12\n")
        fh.write("5,80,0,Classical,5\n")
    with open(meta / "tracks.csv", "w") as fh:
        fh.write(",album,track\n")
        fh.write("track_id,title,genres_all\n")
        fh.write(",,\n")
        fh.write('2,Song,"[25]"\n')
        fh.write('5,Other,"[5]"\n')
        fh.write('9,Empty,"[]"\n')
    ds = FMA_S(base_dir=str(tmp_path), splits=["Rock"], sample_rate=SR)
    assert ds.tracks == ["000002"]  # Punk rolls up to Rock
    ds_none = FMA_S(base_dir=str(tmp_path), splits=["None"], sample_rate=SR)
    assert ds_none.tracks == ["000009"]
    assert ds.get_audio_path("000002").endswith(
        os.path.join("000", "000002.mp3"))


def test_fma_get_audio_decodes_mp3(tmp_path):
    """FMA loads real mp3 audio end-to-end through the native decoder."""
    from timbre_trap_tpu.data.datasets import FMA_S
    from timbre_trap_tpu.data.io import native
    from test_native_audio import _lame, encode_mp3

    if not (native.available() and native.mp3_available() and _lame()):
        pytest.skip("libmpg123/libmp3lame unavailable")

    meta = tmp_path / "fma_metadata"
    meta.mkdir()
    with open(meta / "genres.csv", "w") as fh:
        fh.write("genre_id,#tracks,parent,title,top_level\n")
        fh.write("12,100,0,Rock,12\n")
    with open(meta / "tracks.csv", "w") as fh:
        fh.write(",album,track\n")
        fh.write("track_id,title,genres_all\n")
        fh.write(",,\n")
        fh.write('2,Song,"[12]"\n')
    audio_dir = tmp_path / "000"
    audio_dir.mkdir()
    t = np.arange(2 * SR) / SR
    sig = (0.5 * np.sin(2 * np.pi * 440.0 * t) * 32767).astype(np.int16)
    encode_mp3(str(audio_dir / "000002.mp3"), sig, SR)

    ds = FMA_S(base_dir=str(tmp_path), splits=["Rock"], sample_rate=SR)
    audio = ds.get_audio("000002")
    assert audio.shape[0] == 1 and audio.shape[-1] > SR
    assert np.abs(audio).max() == pytest.approx(1.0, abs=1e-4)
