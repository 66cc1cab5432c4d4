"""utils/watchdog.py: the tunnel-wedge babysitter (kill-on-silence,
gap, retry, verbatim stdout forwarding). The fault model mirrors the
reference's capture-failure recovery test, which registers a deliberately
breaking kernel (reference test/cuda/test_cudagraph.cc:18-27) — here the
'broken kernel' is a child that goes silent forever."""
import sys

from infinitensor_tpu.utils.watchdog import babysit


def test_babysit_forwards_output_and_rc(capfd):
    rc = babysit([sys.executable, "-c",
                  "import sys; print('{\"metric\": \"x\"}');"
                  "print('# hb', file=sys.stderr)"],
                 quiet_s=20, gap_s=0.1, attempts=2)
    out, err = capfd.readouterr()
    assert rc == 0
    assert '{"metric": "x"}' in out        # artifact line forwarded verbatim
    assert "# hb" in err


def test_babysit_kills_silent_child_and_retries(capfd):
    rc = babysit([sys.executable, "-c", "import time; time.sleep(600)"],
                 quiet_s=1.0, gap_s=0.2, attempts=2)
    out, err = capfd.readouterr()
    assert rc != 0
    assert err.count("tunnel wedge") == 2  # both attempts detected + killed


def test_babysit_retry_succeeds_after_one_wedge(tmp_path, capfd):
    """First run wedges (silent sleep), second run succeeds — the flag
    file makes the child stateful across attempts."""
    flag = tmp_path / "ran_once"
    prog = (f"import os, sys, time\n"
            f"p = {str(flag)!r}\n"
            f"if os.path.exists(p):\n"
            f"    print('recovered')\n"
            f"else:\n"
            f"    open(p, 'w').close(); time.sleep(600)\n")
    # quiet_s must exceed interpreter startup (the axon sitecustomize
    # alone can take >1 s), or the healthy retry gets killed too
    rc = babysit([sys.executable, "-c", prog],
                 quiet_s=8.0, gap_s=0.2, attempts=2)
    out, _ = capfd.readouterr()
    assert rc == 0
    assert "recovered" in out
