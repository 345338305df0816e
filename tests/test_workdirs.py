"""Session-scoped working dirs (VERDICT r09 #1): no registered query
may write to a fixed temp path shared across engine sessions. Pins the
structural rule (only workdirs.py composes gettempdir; no /tmp literals
in the package) and the functional guarantees (per-process token,
per-corpus keying, memoization, cross-process disjointness)."""

from __future__ import annotations

import os
import subprocess
import sys

import hpat_jl_spark
from hpat_jl_spark.workdirs import _SESSION_TOKEN, session_workdir

PKG_ROOT = os.path.dirname(hpat_jl_spark.__file__)


def _package_sources():
    for dirpath, _dirs, files in os.walk(PKG_ROOT):
        for f in files:
            if f.endswith(".py"):
                yield os.path.join(dirpath, f)


def test_only_workdirs_composes_gettempdir():
    """The defect class that broke a concurrent sweep during r9 judging
    was a query composing its own name under gettempdir(). The rule:
    plans/operators get unique dirs from mkdtemp (per-invocation) or
    session_workdir (per-session, memoized); nothing else touches the
    shared system temp root."""
    offenders = []
    for path in _package_sources():
        if os.path.basename(path) == "workdirs.py":
            continue
        with open(path) as fh:
            for i, line in enumerate(fh, 1):
                if "gettempdir" in line:
                    offenders.append(f"{path}:{i} {line.strip()}")
    assert offenders == [], "\n".join(offenders)


def test_no_fixed_tmp_literals_in_package():
    offenders = []
    for path in _package_sources():
        with open(path) as fh:
            for i, line in enumerate(fh, 1):
                if '"/tmp' in line or "'/tmp" in line:
                    offenders.append(f"{path}:{i} {line.strip()}")
    assert offenders == [], "\n".join(offenders)


def test_session_workdir_memoizes_and_separates(tmp_path):
    a = session_workdir("t_ckpt")
    assert a == session_workdir("t_ckpt")  # memoized within a session
    assert os.path.isdir(a)
    assert _SESSION_TOKEN in os.path.basename(a)
    b = session_workdir("t_other")
    assert b != a

    # corpus keying: realpath-canonical (ADVICE r06), distinct corpora
    # never share
    c1 = tmp_path / "corpus1"
    c2 = tmp_path / "corpus2"
    c1.mkdir()
    c2.mkdir()
    p1 = session_workdir("t_idx", corpus=str(c1))
    p1b = session_workdir("t_idx", corpus=str(tmp_path / "." / "corpus1"))
    p2 = session_workdir("t_idx", corpus=str(c2))
    assert p1 == p1b
    assert p1 != p2

    # parent is the 0700-verified per-user dir
    parent = os.path.dirname(a)
    st = os.lstat(parent)
    assert st.st_uid == os.getuid()
    assert (st.st_mode & 0o777) == 0o700


def test_two_sessions_never_share_a_path():
    """A second engine session (fresh process) gets a disjoint dir for
    the SAME kind — the exact scenario that raced in r9 judging."""
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "from hpat_jl_spark.workdirs import session_workdir;"
            "print(session_workdir('t_ckpt'))",
        ],
        capture_output=True,
        text=True,
        check=True,
        cwd=os.path.dirname(PKG_ROOT),
    )
    theirs = out.stdout.strip()
    ours = session_workdir("t_ckpt")
    assert theirs != ours
    # and the child's atexit cleanup removed its dir on exit
    assert not os.path.exists(theirs)
