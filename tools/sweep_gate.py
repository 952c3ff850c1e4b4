#!/usr/bin/env python3
"""Run the full six-fixture correctness sweep and record the manifest.

Fixtures: the three driver scale factors (sf0.001 / sf0.01 / sf0.1) plus
the three adversarial injections built from sf0.001 — NULL-injected
(null_sweep.py), extreme-value (edge_sweep.py), Unicode
(unicode_sweep.py). Every registered query must pass check.py's
DuckDB-oracle compare on ALL six before the manifest is (re)written.

The manifest (sweeps/SWEEP_MANIFEST.json) records, per query, a
fingerprint sha256("name|oracle_sql")[:16]. SweepManifestSpec (ScalaTest)
recomputes the same fingerprint from SparkEntry at build time and FAILS
when a registered query is missing from the manifest or its oracle
drifted since the last recorded sweep — so a fresh query cannot land
unswept. (A Scala-side-only edit that keeps the oracle byte-identical is
not caught by the fingerprint; the ordinary sf-sweeps still cover it.)

Usage:
    python3 tools/sweep_gate.py            # full six-fixture run
    python3 tools/sweep_gate.py --manifest-only /tmp/sweep_verify_sf0.001
        # trust an existing PASSING check.py run's oracle dump and only
        # rewrite the manifest (for doc-only changes; use sparingly)
"""
import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(REPO, "sweeps", "SWEEP_MANIFEST.json")


def run(cmd, **kw):
    print(f"+ {' '.join(cmd)}", flush=True)
    return subprocess.run(cmd, cwd=REPO, **kw)


def check(fixture_dir: str, out_dir: str) -> dict:
    """Verify + check.py for one fixture; returns the oracle map on pass."""
    r = run(["sbt", "-batch", f"runMain graft.Verify {fixture_dir} {out_dir}"],
            capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-2000:])
        sys.exit(f"Verify failed on {fixture_dir}")
    r = run([sys.executable, "tools/check.py", fixture_dir, out_dir],
            capture_output=True, text=True)
    tail = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
    print(f"  {fixture_dir}: {tail}")
    if r.returncode != 0 or ", 0 fail" not in tail:
        print(r.stdout[-6000:])
        sys.exit(f"check.py failed on {fixture_dir}")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        return json.load(f)


def fingerprint(name: str, oracle: str) -> str:
    return hashlib.sha256(f"{name}|{oracle}".encode()).hexdigest()[:16]


def write_manifest(oracles: dict, fixtures: list) -> None:
    os.makedirs(os.path.dirname(MANIFEST), exist_ok=True)
    entries = {n: fingerprint(n, sql or "") for n, sql in sorted(oracles.items())}
    with open(MANIFEST, "w") as f:
        json.dump({"fixtures": fixtures, "queries": entries}, f, indent=1,
                  sort_keys=True)
        f.write("\n")
    print(f"wrote {MANIFEST}: {len(entries)} queries, fixtures={fixtures}")


def main() -> None:
    if len(sys.argv) == 3 and sys.argv[1] == "--manifest-only":
        with open(os.path.join(sys.argv[2], "oracle_sql.json")) as f:
            write_manifest(json.load(f), ["manifest-only"])
        return

    td = os.environ.get("GRAFT_TESTDATA", "/root/testdata")
    tmp = os.environ.get("GRAFT_SWEEP_TMP", "/tmp")
    fixtures = []
    oracles = {}
    # adversarial fixtures from sf0.001 (cheap, and edge cases live in
    # the injected values, not the volume)
    for kind in ("null", "edge", "unicode"):
        fix = os.path.join(tmp, f"sf{kind}")
        r = run([sys.executable, f"tools/{kind}_sweep.py",
                 os.path.join(td, "sf0.001"), fix], capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-2000:], r.stderr[-2000:])
            sys.exit(f"{kind}_sweep.py fixture build failed")
        oracles = check(fix, os.path.join(tmp, f"sweep_verify_{kind}"))
        fixtures.append(kind)
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        oracles = check(os.path.join(td, sf),
                        os.path.join(tmp, f"sweep_verify_{sf}"))
        fixtures.append(sf)
    write_manifest(oracles, fixtures)


if __name__ == "__main__":
    main()
