"""Race detection for the native ring: build the C++ stress harness under
ThreadSanitizer and run it (SURVEY.md §5 — the reference has no sanitizers)."""

import os
import shutil
import subprocess

import pytest

NATIVE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tempest_tpu",
    "native",
)


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_ring_tsan_stress(tmp_path):
    exe = tmp_path / "ring_stress"
    build = subprocess.run(
        [
            "g++", "-O1", "-g", "-std=c++17", "-fsanitize=thread", "-fPIE",
            os.path.join(NATIVE, "host_core.cpp"),
            os.path.join(NATIVE, "ring_stress.cpp"),
            "-o", str(exe), "-lpthread",
        ],
        capture_output=True, text=True, timeout=180,
    )
    assert build.returncode == 0, build.stderr[-800:]
    run = subprocess.run(
        [str(exe)], capture_output=True, text=True, timeout=300,
        env={**os.environ, "TSAN_OPTIONS": "halt_on_error=1 exitcode=66"},
    )
    assert run.returncode == 0, (
        f"TSan/stress failure (rc={run.returncode}):\n"
        f"{run.stdout[-400:]}\n{run.stderr[-1200:]}"
    )
    assert run.stdout.startswith("OK")
