"""Per-process scratch-root isolation for write-back queries.

VERDICT r9 item 2: five write-back families shared a fixed tempdir
path across processes — rmtree-then-write-then-read-back is correct
sequentially but racy under concurrent verification drives (r9's
closing audit saw one such collision on q_sink_pyds). workdir.py now
derives a per-process root; these tests pin (1) the root is unique
across processes and stable within one, (2) no package module can
quietly reintroduce a fixed gettempdir path, and (3) two REAL
concurrent drives of the same write-back key don't collide.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_scratch_root_stable_within_process():
    from oke_cassandra_spark_locality_demo_spark import workdir

    a = workdir.scratch_root("io")
    b = workdir.scratch_root("io")
    assert a == b
    assert os.path.isdir(a)
    assert a.startswith(workdir.process_root())
    # repeat invocations of a key must hit the same path so their
    # overwrite semantics still apply
    assert workdir.scratch_root("pyds") != a


def test_scratch_root_unique_across_processes():
    script = (
        "import sys; sys.path.insert(0, {repo!r}); "
        "from oke_cassandra_spark_locality_demo_spark.workdir import process_root; "
        "print(process_root())"
    ).format(repo=REPO)
    roots = []
    for _ in range(2):
        proc = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True, text=True, timeout=120,
        )
        assert proc.returncode == 0, proc.stderr[-500:]
        roots.append(proc.stdout.strip())
    here = __import__(
        "oke_cassandra_spark_locality_demo_spark.workdir", fromlist=["workdir"]
    ).process_root()
    assert len({roots[0], roots[1], here}) == 3, (roots, here)


#: Package modules allowed to touch tempfile.gettempdir at all, with
#: the reason each is concurrency-safe. Everything else must go
#: through workdir.scratch_root.
_GETTEMPDIR_ALLOWLIST = {
    # the per-process helper itself
    "workdir.py",
    # shared events µs-staging cache: PID-suffixed tmp + atomic
    # os.replace, readers only ever see a complete file
    "catalog.py",
    # shared streaming-source staging cache: PID-unique dir published
    # via atomic marker replace, readers follow the marker
    "streaming/runtime.py",
    # addPyFile zip: filename is PID-suffixed
    "registry.py",
}


def test_no_fixed_tempdir_paths_outside_allowlist():
    import oke_cassandra_spark_locality_demo_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    offenders = []
    for dirpath, _dirs, files in os.walk(pkg_dir):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, pkg_dir)
            with open(path) as f:
                src = f.read()
            if "gettempdir" in src and rel not in _GETTEMPDIR_ALLOWLIST:
                offenders.append(rel)
    assert not offenders, (
        f"fixed-tempdir regression: {offenders} use tempfile.gettempdir "
        "directly — route write-back scratch through workdir.scratch_root "
        "(per-process) or add to the allowlist with a safety argument"
    )


_DRIVE_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from oke_cassandra_spark_locality_demo_spark import registry
from oke_cassandra_spark_locality_demo_spark.workdir import process_root

spark = (
    SparkSession.builder.master("local[2]")
    .appName("workdir-concurrency")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.001"
# three drives per process widen the window where the OTHER process is
# mid-read while this one rmtrees/overwrites — with the old shared
# fixed path this interleaving is exactly the r9 q_sink_pyds collision
for _ in range(3):
    n = registry.get("q_source_csv").fn(spark, sf).count()
    assert n > 0, n
print("ROOT=" + process_root())
print("CONCURRENT_DRIVE_OK")
"""


def test_concurrent_write_back_drives_do_not_collide():
    """Two real processes drive the same write-back key concurrently.

    Under the pre-r10 fixed shared path this interleaved rmtree /
    write / read-back on ONE directory; with per-process roots the
    drives are physically disjoint and both must succeed."""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _DRIVE_SCRIPT.format(repo=REPO)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env={**os.environ, "PYTHONDONTWRITEBYTECODE": "1"},
        )
        for _ in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0 and "CONCURRENT_DRIVE_OK" in out, (
            out[-500:], err[-1500:],
        )
        outs.append(out)
    roots = {
        line.split("=", 1)[1]
        for out in outs for line in out.splitlines()
        if line.startswith("ROOT=")
    }
    assert len(roots) == 2, roots


def test_fork_child_exit_does_not_delete_parent_root():
    """ADVICE r10: a fork()ed child inherits the atexit hook AND the
    parent-PID-named _ROOT; on a normal child exit an unguarded hook
    would rmtree the PARENT's live scratch root. Runs in a standalone
    subprocess (forking the pytest process itself would clone a live
    JVM's calling thread)."""
    script = (
        "import os, sys\n"
        "sys.path.insert(0, {repo!r})\n"
        "from oke_cassandra_spark_locality_demo_spark import workdir\n"
        "root = workdir.scratch_root('forktest')\n"
        "pid = os.fork()\n"
        "if pid == 0:\n"
        "    sys.exit(0)  # normal exit -> child runs atexit hooks\n"
        "os.waitpid(pid, 0)\n"
        "assert os.path.isdir(root), 'child exit deleted parent root'\n"
        "print('FORK_GUARD_OK')\n"
    ).format(repo=REPO)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0 and "FORK_GUARD_OK" in proc.stdout, (
        proc.stdout[-500:], proc.stderr[-1000:],
    )
