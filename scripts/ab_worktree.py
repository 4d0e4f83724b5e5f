"""Standing interleaved worktree A/B for bench entries (round-16).

The project's standing rule — "persistent regression on a touched path
→ same-box interleaved worktree A/B" — was executed by hand three
rounds in a row (r11-r13) and skipped once (r15, where a calibration
probe mis-adjudicated a host drift).  This tool makes the rule one
command:

    python scripts/ab_worktree.py --ref 570addc --group curated_pipeline
    python scripts/ab_worktree.py --ref 570addc --group headline:ohlcv_1h \
        --files real_time_financial_market_data_pipeline_spark/streaming/incremental.py

Arms:
  A = a worktree at HEAD with `--files` checked out from `--ref`
      (holds the bench harness and every untouched module constant —
      the highest-precision form; default --files = every repo .py the
      ref..HEAD diff touches under the package), or a full checkout of
      --ref with --full-checkout (use when the touched set is too
      entangled; note the harness then differs too).
  B = a worktree at HEAD.

Each measurement is a FRESH JVM subprocess (plan/codegen cache cannot
leak across arms), arms alternate A/B/A/B so host drift lands on both
symmetrically, and the summary prints per-arm samples, medians, the
median ratio, and per-pair wins.  Exit code 1 when arm B's median is
>10% above arm A's on any requested metric (i.e. the regression
reproduces under interleaving).

Groups: a bench_<group> function name from bench.py that takes
(spark, sf_dir) and returns {metric: seconds}, or `headline:<name>` to
time QUERIES[<name>] with the same min-of-2 bench.py uses.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ABDIR = os.path.join(REPO, ".abwork_tool")
PKG = "real_time_financial_market_data_pipeline_spark/"


def arm_a_files(
    name_status: str,
) -> tuple[list[str], list[str], list[tuple[str, str]]]:
    """Parse `git diff --name-status ref..HEAD` into (checkout, added,
    renamed) for arm A (round-16 ADVICE, low): a plain name-only list
    filtered on exists-at-HEAD silently DROPPED files deleted between
    ref and HEAD, so arm A ran ref-era modules without a module they
    may import.  checkout = package .py files with a version at ref
    (M/D/T/... and the OLD path of renames — `git checkout ref --
    path` recreates deleted-at-HEAD files); added = HEAD-only files a
    ref checkout would fail on (warn: ref-era code never imported
    them); renamed = (old, new) pairs (warn: arm A gets the ref-era
    module at old AND keeps the HEAD file at new)."""
    is_src = lambda f: f.endswith(".py") and f.startswith(PKG)  # noqa: E731
    files: list[str] = []
    added: list[str] = []
    renamed: list[tuple[str, str]] = []
    for line in name_status.splitlines():
        parts = line.split("\t")
        status = parts[0]
        if status.startswith(("R", "C")) and len(parts) == 3:
            old, new = parts[1], parts[2]
            if status.startswith("R") and is_src(old):
                files.append(old)
                renamed.append((old, new))
            elif is_src(new):
                # C (copy): old path unchanged at HEAD, new is HEAD-only.
                # R with old OUTSIDE the package (round-18 ADVICE): the
                # ref-era module at old is deleted at HEAD but was never
                # package source, so arm A correctly gets only the
                # HEAD-added new path — surface it so the adjudicator
                # knows the old-path module is out of scope by design.
                if status.startswith("R"):
                    # round-18 ADVICE: stderr, not stdout — every other
                    # diagnostic path here is silent and a caller
                    # capturing stdout for results must not ingest the
                    # warning line into its machine-readable output
                    print(
                        f"WARNING: rename into the package from outside it "
                        f"({old} -> {new}); ref-era module at {old} is out "
                        f"of arm-A scope",
                        file=sys.stderr,
                    )
                added.append(new)
        elif len(parts) == 2 and is_src(parts[1]):
            if status == "A":
                added.append(parts[1])
            else:  # M, D, T — a version exists at ref
                files.append(parts[1])
    return files, added, renamed


def child(root: str, group: str, out_path: str) -> None:
    root = os.path.abspath(root)
    sys.path.insert(0, root)
    import bench  # the arm root's bench.py

    assert bench.__file__.startswith(root), bench.__file__
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = bench.get_spark(app_name="ab_worktree")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm
    if group.startswith("headline:"):
        name = group.split(":", 1)[1]
        from real_time_financial_market_data_pipeline_spark.serving.queries import QUERIES

        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings = {name: round(best, 3)}
    else:
        timings = getattr(bench, f"bench_{group}")(spark, sf_dir)
        if not isinstance(timings, dict):
            # tuple-returning bench fns (quote_enrich, streaming_medallion,
            # incremental single-run forms) lead with the drain seconds —
            # adapt to the {metric: seconds} contract (round-21)
            timings = {group: round(float(timings[0]), 3)}
    with open(out_path, "a", encoding="utf-8") as fh:
        fh.write(json.dumps({"root": root, **timings}) + "\n")
    spark.stop()


def _run(cmd: list[str], **kw) -> str:
    r = subprocess.run(cmd, capture_output=True, text=True, **kw)
    if r.returncode != 0:
        raise RuntimeError(f"{' '.join(cmd)}: {r.stderr.strip()[-800:]}")
    return r.stdout


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", required=True, help="git ref for arm A's code")
    ap.add_argument("--group", required=True, action="append",
                    help="bench_<group> function, or headline:<query>")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--files", nargs="*", default=None,
                    help="files to check out from --ref into arm A "
                         "(default: package .py files in the ref..HEAD diff)")
    ap.add_argument("--full-checkout", action="store_true",
                    help="arm A = full checkout of --ref (harness differs!)")
    args = ap.parse_args()

    os.makedirs(ABDIR, exist_ok=True)
    arm_a, arm_b = os.path.join(ABDIR, "armA"), os.path.join(ABDIR, "armB")
    for p in (arm_a, arm_b):
        if os.path.exists(p):
            _run(["git", "-C", REPO, "worktree", "remove", "--force", p])
    _run(["git", "-C", REPO, "worktree", "add", "--detach", arm_b, "HEAD"])
    if args.full_checkout:
        _run(["git", "-C", REPO, "worktree", "add", "--detach", arm_a, args.ref])
    else:
        _run(["git", "-C", REPO, "worktree", "add", "--detach", arm_a, "HEAD"])
        files = args.files
        if not files:
            diff = _run(["git", "-C", REPO, "diff", "--name-status",
                         f"{args.ref}..HEAD"])
            files, added, renamed = arm_a_files(diff)
            if added:
                print(f"WARNING: arm A keeps {len(added)} HEAD-added "
                      f"package file(s) with no {args.ref} version "
                      f"(ref-era code never imported them): {added}")
            for old, new in renamed:
                print(f"WARNING: rename {old} -> {new}: arm A gets the "
                      f"ref-era module at {old} AND keeps the HEAD file "
                      f"at {new}")
            if not files:
                print("ref..HEAD touches no source files — nothing to A/B")
                for p in (arm_a, arm_b):
                    _run(["git", "-C", REPO, "worktree", "remove",
                          "--force", p])
                return 0
        print(f"arm A = HEAD with {len(files)} file(s) from {args.ref}:")
        for f in files:
            print(f"  {f}")
        _run(["git", "-C", arm_a, "checkout", args.ref, "--", *files])

    out = os.path.join(ABDIR, "results.jsonl")
    open(out, "w").close()
    try:
        for group in args.group:
            for rep in range(args.reps):
                for root in (arm_a, arm_b):
                    label = "A" if root == arm_a else "B"
                    print(f"=== rep {rep + 1} arm {label} group {group} ===",
                          flush=True)
                    env = dict(os.environ, PYTHONPATH=root)
                    r = subprocess.run(
                        [sys.executable, os.path.abspath(__file__),
                         "--child", root, group, out],
                        env=env, cwd=root, capture_output=True, text=True,
                    )
                    if r.returncode != 0:
                        print(r.stderr[-1500:])
                        return 2
    finally:
        # worktrees must not leak on a failed child or a ^C — recreate
        # is cheap, a stale registered worktree blocks the next run
        for p in (arm_a, arm_b):
            try:
                _run(["git", "-C", REPO, "worktree", "remove", "--force", p])
            except RuntimeError:
                pass

    rows = [json.loads(l) for l in open(out)]
    a_rows = [r for r in rows if r["root"] == arm_a]
    b_rows = [r for r in rows if r["root"] == arm_b]
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    failed = False
    # union of keys across ALL arm-A rows (round-16 ADVICE, medium):
    # with multiple --group flags each row carries only its own group's
    # metrics, and reading a_rows[0] alone silently dropped every later
    # group from the summary AND the exit-code regression check
    metrics = sorted({k for r in a_rows for k in r if k != "root"})
    for m in metrics:
        av = [r[m] for r in a_rows if m in r]
        bv = [r[m] for r in b_rows if m in r]
        if not av or not bv:
            continue
        ratio = med(bv) / med(av)
        wins = sum(b < a for a, b in zip(av, bv))
        verdict = "REGRESSION" if ratio > 1.10 else "ok"
        if ratio > 1.10:
            failed = True
        print(f"{m}: A(ref)={av} med {med(av):.3f} | B(HEAD)={bv} "
              f"med {med(bv):.3f} | B/A {ratio:.3f} | B wins {wins}/{len(bv)}"
              f" | {verdict}")
    return 1 if failed else 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        sys.exit(main())
