"""Exit 0 iff the TPU backend is ready, bounded — never hangs, never SIGTERMs a
device op mid-compile (the failure mode that wedges the tunnel, NOTES.md).

Usage: python tools/tpu_ready.py [deadline_s]
Prints one line: READY | NOT-READY: <reason>.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hcflow_tpu.utils.backend_guard import backend_ready  # noqa: E402


def main():
    deadline = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    ok, reason = backend_ready(deadline_s=deadline, retries=2, backoff_s=10.0)
    if ok:
        print("READY")
        sys.stdout.flush()
        os._exit(0)
    print(f"NOT-READY: {reason}")
    sys.stdout.flush()
    os._exit(1)


if __name__ == "__main__":
    main()
