"""Second worker for tools/sf10_chunked.py: processes the chunk ids
given on the command line (e.g. ``9 8 7 6 5``), skipping parts that
already exist, so two workers can split the chunk list and meet in the
middle. Run tools/sf10_chunked.py afterwards to merge (it skips every
existing part).

Run:  python tools/sf10_chunk_worker.py sf_dir chunk_id [chunk_id ...]
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sf10_chunked import ORACLE_SKIP  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    import __spark_entry__ as entry

    names = sorted(entry.queries().keys())
    chunks = [names[i : i + 16] for i in range(0, len(names), 16)]
    for i in [int(a) for a in sys.argv[2:]]:
        part = f"CORRECTNESS_sf10_part{i:02d}.json"
        path = os.path.join(REPO, part)
        if os.path.exists(path):
            print(f"== chunk {i}: exists, skipping ==", flush=True)
            continue
        rx = "^(" + "|".join(re.escape(n) for n in chunks[i]) + ")$"
        print(f"== chunk {i}: {len(chunks[i])} specs ==", flush=True)
        # check=False: a per-spec error still yields a complete part
        # file (see sf10_chunked.py)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools",
                                          "correctness_full.py"), sf_dir],
            env={
                **os.environ,
                "SPECS_ONLY": rx,
                "ORACLE_SKIP": ORACLE_SKIP,
                "CORRECTNESS_OUT": part + ".w2tmp",
            },
            check=False,
            cwd=REPO,
        )
        if not os.path.exists(path + ".w2tmp"):
            raise RuntimeError(f"chunk {i}: gate died before writing")
        os.replace(path + ".w2tmp", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
