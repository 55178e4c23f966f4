"""Preemption-safe trainer recovery: SIGTERM mid-run checkpoints at the
step boundary; --resume_from_checkpoint latest continues from it."""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run_trainer(out_dir, extra, wait_sig=None, timeout=420):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable, str(REPO / "cli" / "train.py"),
        "--model", "wan-tiny", "--dtype", "fp32", "--synthetic_data",
        "--num_latent_t", "4", "--video_height", "64", "--video_width", "64",
        "--sta_window", "3", "3", "1", "--sta_tile", "2", "2", "2",
        "--lowres_window", "2", "2", "2",
        "--gradient_accumulation_steps", "1",
        "--max_train_steps", "50", "--checkpointing_steps", "50",
        "--output_dir", str(out_dir),
    ] + extra
    proc = subprocess.Popen(cmd, env=env, cwd=REPO,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)
    out_lines = []
    if wait_sig is None:
        out, _ = proc.communicate(timeout=timeout)
        return proc.returncode, out
    # wait for a few training steps, then SIGTERM
    t0 = time.time()
    seen_steps = 0
    for line in proc.stdout:
        out_lines.append(line)
        if "[train] step" in line or "s/step" in line:
            seen_steps += 1
            if seen_steps >= 2:
                proc.send_signal(signal.SIGTERM)
                break
        if time.time() - t0 > timeout:
            proc.kill()
            raise TimeoutError("".join(out_lines[-20:]))
    out, _ = proc.communicate(timeout=120)
    out_lines.append(out)
    return proc.returncode, "".join(out_lines)


def test_sigterm_checkpoints_and_resume(tmp_path):
    out_dir = tmp_path / "exp"
    rc, out = _run_trainer(out_dir, [], wait_sig=signal.SIGTERM)
    assert "preempted: checkpoint" in out, out[-2000:]
    ckpts = list((out_dir / "ckpt").glob("step-*"))
    assert ckpts, out[-2000:]

    # resume from latest runs a couple more steps and checkpoints normally
    rc2, out2 = _run_trainer(
        out_dir,
        ["--resume_from_checkpoint", "latest", "--max_train_steps", "5",
         "--checkpointing_steps", "2"],
    )
    assert rc2 == 0, out2[-2000:]
    assert "checkpoint ->" in out2, out2[-2000:]
