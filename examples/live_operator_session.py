"""A complete live operator session, scripted — the framework's analogue of
the reference's interactive GUI workflow (``/root/reference/src/GUI.jl``):
watch the stream, correlate, inspect the ranked line peaks, pick one, lock
the refresh from observed drift, switch to fidelity mode, record raw IQ.

Usage:
    python examples/live_operator_session.py

Runs entirely on a synthetic 1024x768@60 source (the repo ships no recorded
IQ).  For a real interactive session over ssh, use:

    python -m tempest_tpu.app.cli stream --source replay --file cap.dat \
        --fs 20e6 --console --render terminal --crosshair
"""

import sys

import numpy as np

sys.path.insert(0, ".")  # run from the repo root

import tempest_tpu as tt  # noqa: E402
from tempest_tpu.render.screen import write_png  # noqa: E402
from tempest_tpu.runtime.console import OperatorConsole  # noqa: E402
from tempest_tpu.runtime.sources import SyntheticSource  # noqa: E402
from tempest_tpu.runtime.stream import StreamingRuntime  # noqa: E402


def main() -> int:
    mode = tt.ALL_VIDEO_MODES["1024x768 @ 60Hz"]
    fs = 16e6
    src = SyntheticSource(mode, fs, block_size=int(fs * 0.15), snr_db=20.0,
                          seed=7)
    # Start deliberately mis-configured — the operator fixes it live.
    wrong = tt.VideoMode(mode.width, mode.height + 3, 60.02)
    rt = StreamingRuntime(src, wrong, alpha=0.4)
    rt.start()

    session = [
        "status",
        "correlate 0.1",   # task 1: live re-estimate (fixes mode + fv)
        "peaks",           # ranked line-period alternatives
        "pick 0",          # adopt the top peak (the reference's click)
        "alpha 0.6",
        "status",
        "drift",           # close the refresh loop on observed sync drift
        "fidelity on",     # sub-sample-exact cuts now that fv is locked
        "record 1",        # task 3: dump one raw block to dumpIQ_N.dat
        "status",
        "quit",
    ]
    console = OperatorConsole(rt, commands=session)
    img = console.run()
    rt.stop()

    if img is not None:
        write_png(img, "live_session.png")
        print(f"final mode: {rt.mode.width}x{rt.mode.height} "
              f"@ {rt.mode.refresh:.4f} Hz | fidelity={rt.fidelity} | "
              f"{rt.frames_out} frames -> live_session.png")
    if rt.last_record_path:
        print(f"raw IQ recorded to {rt.last_record_path} "
              f"({np.round(src.sample_rate / 1e6, 1)} Msps)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
