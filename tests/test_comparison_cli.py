"""End-to-end test of the comparison CLI baselines on a toy Bach10 corpus."""

import os
import subprocess
import sys

import numpy as np
import pytest
import scipy.io

from timbre_trap_tpu.data.io import save_wav
from timbre_trap_tpu.transform.design import midi_to_hz

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture()
def toy_bach10(tmp_path):
    sr = 22050
    track = "01-AchGottundHerr"
    d = tmp_path / track
    d.mkdir()
    n_frames = 400  # ~4 s of 10 ms annotation frames
    secs = 0.023 + 0.010 * n_frames + 0.1
    t = np.arange(int(secs * sr)) / sr
    midis = [60.0, 67.0]
    audio = sum(0.4 * np.sin(2 * np.pi * float(midi_to_hz(m)) * t)
                for m in midis)
    save_wav(str(d / f"{track}.wav"), audio.astype(np.float32), sr)
    gtf0 = np.zeros((4, n_frames))
    gtf0[0, :] = midis[0]
    gtf0[1, :] = midis[1]
    scipy.io.savemat(str(d / f"{track}-GTF0s.mat"), {"GTF0s": gtf0})
    return str(tmp_path)


def test_comparison_baselines_run(toy_bach10):
    """lin-CQT and log-CQT peak-picking must produce sane F1 on pure tones."""
    # The env var alone cannot switch backends here (sitecustomize pins the
    # TPU plugin); run the CLI through a jax.config override instead.
    code = (
        "import jax, runpy, sys; "
        "jax.config.update('jax_platforms', 'cpu'); "
        f"sys.argv = ['comparison.py', '--bach10-dir', {toy_bach10!r}]; "
        f"runpy.run_path({os.path.join(REPO, 'experiments', 'comparison.py')!r},"
        " run_name='__main__')"
    )
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "[Bach10/lin-CQT]" in out.stdout and "[Bach10/log-CQT]" in out.stdout
    # The linear-CQT baseline should transcribe clean tones quite well.
    import re

    lin = re.search(r"\[Bach10/lin-CQT\].*?'mpe/f1-score': ([0-9.]+)",
                    out.stdout)
    assert lin, out.stdout[-2000:]
    assert float(lin.group(1)) > 0.3


def test_parity_cli(toy_bach10, tmp_path):
    """experiments/parity.py runs the full tt-orig.pt recipe end to end:
    torch .pt checkpoint -> layout import -> cqt_pytorch-compat frame ->
    reference evaluation protocol -> BASELINE table + JSON."""
    import torch

    from timbre_trap_tpu.interop import export_torch_state_dict
    from timbre_trap_tpu.models import TimbreTrap

    model = TimbreTrap(sample_rate=22050, n_octaves=6, bins_per_octave=12,
                       secs_per_block=3, latent_size=32, model_complexity=1)
    ckpt = str(tmp_path / "tt-toy.pt")
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
                export_torch_state_dict(model.params).items()}, ckpt)

    out_json = str(tmp_path / "parity.json")
    code = (
        "import jax, runpy, sys; "
        "jax.config.update('jax_platforms', 'cpu'); "
        f"sys.argv = ['x', '--checkpoint', {ckpt!r}, '--datasets', 'Bach10',"
        f" '--base-dirs', {toy_bach10!r},"
        " '--n-octaves', '6', '--bins-per-octave', '12',"
        " '--latent-size', '32', '--model-complexity', '1',"
        f" '--out', {out_json!r}]; "
        f"runpy.run_path({os.path.join(REPO, 'experiments', 'parity.py')!r},"
        " run_name='__main__')"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=840)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "| Bach10 |" in out.stdout, out.stdout[-2000:]
    import json

    with open(out_json) as fh:
        results = json.load(fh)
    assert results["compat"] == "cqt_pytorch"
    assert "mpe/f1-score" in results["results"]["Bach10"]
    assert np.isfinite(results["results"]["Bach10"]["loss/total"])


def test_evaluate_cli(toy_bach10, tmp_path):
    """The evaluate CLI loads a checkpoint and prints per-set results."""
    from timbre_trap_tpu.models import TimbreTrap

    ckpt = str(tmp_path / "model")
    TimbreTrap(sample_rate=22050, n_octaves=6, bins_per_octave=12,
               secs_per_block=3, latent_size=32,
               model_complexity=1).save(ckpt)
    code = (
        "import jax, runpy, sys; "
        "jax.config.update('jax_platforms', 'cpu'); "
        f"sys.argv = ['x', '--checkpoint', {ckpt!r}, '--datasets', 'Bach10',"
        f" '--base-dirs', {toy_bach10!r},"
        " '--n-octaves', '6', '--bins-per-octave', '12',"
        " '--latent-size', '32', '--model-complexity', '1']; "
        f"runpy.run_path({os.path.join(REPO, 'experiments', 'evaluate.py')!r},"
        " run_name='__main__')"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=840)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "mpe/f1-score" in out.stdout
    assert "reconstruction/SDR" in out.stdout
