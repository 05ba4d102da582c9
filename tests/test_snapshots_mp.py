"""Cross-PROCESS concurrent-writer torture for the snapshot format.

The model-based property test in tests/test_snapshots.py covers
single-process interleavings; this file pins the `_exclusive_write`
claims end-to-end where they actually matter — separate OS processes
racing ``_publish`` (the optimistic-concurrency commit core),
``publish_staged`` (WAP) and ``expire_versions`` (retention) against
each other on one table directory.

No Spark involvement: the manifest layer is pure filesystem code, and
data files are stand-in byte files (manifests hold paths; nothing here
reads parquet). The invariants asserted at the end are the table
format's whole contract:

- NO LOST COMMIT: every file a worker successfully committed is
  referenced by the head manifest (appends are by-reference and
  monotone).
- NO PHANTOM: the head manifest references only files that exist.
- NO HOLE: retained manifest versions form one contiguous range ending
  at the head (expire trims a prefix, never punches holes).
- EXACT VERSION ACCOUNTING: head version == seed + total successful
  publishes (each success minted exactly one version — two writers can
  never both win a version number).
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)

_COMMIT_WORKER = """
import sys
from pathlib import Path

sys.path.insert(0, {repo!r})
from market_data_pipeline_databricks_spark.sources import snapshots as S

tdir, wid, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
data = Path(tdir) / "data"
data.mkdir(parents=True, exist_ok=True)
for i in range(k):
    f = data / f"w{{wid}}-{{i}}.bin"
    f.write_text("d")
    fp = str(f.resolve())
    seg = S._write_segment(tdir, [fp])  # immutable: reusable on retry
    while True:
        prev = S.latest_version(tdir)
        segs, removed = S._base_refs(tdir, prev)
        try:
            S._publish(tdir, prev + 1, segs + [seg], removed)
            break
        except S.ConcurrentCommitError:
            continue
print(k)
"""

_WAP_WORKER = """
import json
import sys
from pathlib import Path

sys.path.insert(0, {repo!r})
from market_data_pipeline_databricks_spark.sources import snapshots as S

tdir, wid, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
data = Path(tdir) / "data"
data.mkdir(parents=True, exist_ok=True)
for i in range(k):
    f = data / f"s{{wid}}-{{i}}.bin"
    f.write_text("s")
    marker = Path(tdir) / f"staging-b{{wid}}.json"
    marker.write_text(json.dumps({{"files": [str(f.resolve())]}}))
    while True:
        try:
            S.publish_staged(tdir, f"b{{wid}}")
            break
        except S.ConcurrentCommitError:
            continue
print(k)
"""

_EXPIRE_WORKER = """
import sys
import time
from pathlib import Path

sys.path.insert(0, {repo!r})
from market_data_pipeline_databricks_spark.sources import snapshots as S

tdir, rounds = sys.argv[1], int(sys.argv[2])
for _ in range(rounds):
    S.expire_versions(tdir, keep_last=10)
    time.sleep(0.02)
print(rounds)
"""


def test_concurrent_commit_wap_expire_across_processes(tmp_path):
    from market_data_pipeline_databricks_spark.sources import snapshots as S

    tdir = str(tmp_path / "t")
    data = Path(tdir) / "data"
    data.mkdir(parents=True)
    seed = data / "seed.bin"
    seed.write_text("0")
    S._publish(tdir, 1, [S._write_segment(tdir, [str(seed.resolve())])], [])

    n_commit, n_wap, k = 3, 2, 20
    procs = []
    for w in range(n_commit):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    "-c",
                    _COMMIT_WORKER.format(repo=REPO),
                    tdir,
                    f"c{w}",
                    str(k),
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    for w in range(n_wap):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    "-c",
                    _WAP_WORKER.format(repo=REPO),
                    tdir,
                    f"{w}",
                    str(k),
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    procs.append(
        subprocess.Popen(
            [
                sys.executable,
                "-c",
                _EXPIRE_WORKER.format(repo=REPO),
                tdir,
                "60",
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
    )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker crashed:\n{err}"
        outs.append(out.strip())

    total = (n_commit + n_wap) * k
    head = S.latest_version(tdir)
    # exact version accounting: each successful publish minted one
    # version (expire removes old manifests, never renumbers)
    assert head == 1 + total
    head_files = set(S._read_manifest(tdir, head))
    # no phantom
    missing = [f for f in head_files if not Path(f).exists()]
    assert not missing
    # no lost commit: the head references exactly the seed plus every
    # worker file (commit workers name files wc{w}-{i}, WAP s{w}-{i})
    expected = {str((data / "seed.bin").resolve())}
    for w in range(n_commit):
        expected |= {
            str((data / f"wc{w}-{i}.bin").resolve()) for i in range(k)
        }
    for w in range(n_wap):
        expected |= {
            str((data / f"s{w}-{i}.bin").resolve()) for i in range(k)
        }
    assert head_files == expected
    # no hole: retained versions are one contiguous range ending at head
    vers = sorted(
        int(p.stem[1:])
        for p in Path(tdir).glob("v*.json")
        if p.stem[1:].isdigit()
    )
    assert vers == list(range(vers[0], head + 1))
    # every WAP marker consumed
    assert not list(Path(tdir).glob("staging-*.json"))
    # no duplicate references within the head manifest (resolution
    # does not dedup, so a file listed by two segments would show here)
    raw = S._read_manifest(tdir, head)
    assert len(raw) == len(set(raw))
