"""Behavioral regression tests for the r14 ADVICE closures.

The r13 closures got regression tests (tests/test_oracle_dtypes.py);
these pin the two r14 closures that are observable end-to-end:

1. `check_scale_sliced._check_res_input` symlinks non-sliced tables
   with ABSOLUTE targets — with a RELATIVE sf_dir the old code made
   the target resolve relative to the tmp dir and dangle, failing the
   Spark read for any SLICED_INPUT entry touching another table (and,
   latently, the sliced table read itself once another table joins
   the protocol).
2. `tools/dtype_audit.py` exits 1 with a WARN when an
   EXPECTED_MISMATCH entry reports NO mismatch — a vanished seam
   hollows out the differential probe silently otherwise.

(The other two closures — try/finally duckdb connections and the
top-level residues list — are pinned by reading the committed
SCALECHECK artifact shape and by code review; they have no cheap
external observable.)
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys

#: repo root derived from THIS file so the subprocess test is
#: cwd-independent (r15 ADVICE: '.' + os.getcwd() broke pytest runs
#: launched from any other directory)
_REPO_ROOT = str(pathlib.Path(__file__).resolve().parents[1])


def test_sliced_input_protocol_survives_relative_sf_dir(spark, tmp_path):
    # The configured SLICED_INPUT entries only read their own sliced
    # table (the ADVICE item was latent), so drive the protocol with a
    # probe query that READS A SYMLINKED COMPANION TABLE: under the
    # old relative-target code the nation symlink dangles inside the
    # tmp dir and the Spark read errors; under the fix it resolves.
    from skylinemapreducehadoop_spark.sources.tables import load_table
    from tools.check_scale_sliced import _check_res_input

    def probe(sess, d):
        return load_table(sess, d, "nation").select(
            "n_nationkey"
        ).orderBy("n_nationkey")

    oracle = "SELECT n_nationkey FROM nation ORDER BY n_nationkey"
    rel = os.path.relpath("/root/testdata/sf0.001", os.getcwd())
    assert not os.path.isabs(rel)
    rec = _check_res_input(
        spark, probe, oracle, rel, "documents", "doc_id",
        mod=2, res=0, tmp_root=str(tmp_path),
    )
    assert rec["err"] is None, rec["err"]
    assert rec["hash_match"] is True, rec


def test_dtype_audit_warns_and_fails_on_vanished_seam():
    # Point EXPECTED_MISMATCH at an entry KNOWN to be seam-free
    # (canary_sum_cast, the CAST half of the differential pair): the
    # audit must refuse to print a plain ok and must exit 1.
    code = (
        f"import sys; sys.path.insert(0, {_REPO_ROOT!r})\n"
        "import tools.dtype_audit as m\n"
        "m.EXPECTED_MISMATCH = {'canary_sum_cast'}\n"
        "sys.argv = ['dtype_audit', '/root/testdata/sf0.001',"
        " 'canary_sum_cast']\n"
        "raise SystemExit(m.main())\n"
    )
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, cwd=_REPO_ROOT, env=env,
    )
    assert proc.returncode == 1, proc.stdout + proc.stderr
    assert "WARN  canary_sum_cast" in proc.stdout, proc.stdout
