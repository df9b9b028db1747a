#!/usr/bin/env python3
"""Re-pin BASELINE.json from fresh-JVM bench runs of the current build.

Per-key MAX across the given runs (each run is itself a min-of-3, so the
max-of-mins pin carries each key's honest cross-run headroom). For the
contention-prone sub-second keys (GC/scheduler noise dominates their
ratios), the max additionally folds the prior round's committed
fresh-JVM samples when those keys' code is unchanged — widening the
sample is the honest form of headroom (every pinned value was actually
measured on a fresh JVM of a build with the identical plan).

Usage: repin_baseline.py <round> <run.json>...
       [--prior path.json ...]   fold these committed prior-round run
                                 files into the noisy-key sample (each
                                 path must exist — a missing prior file
                                 is an error, not a silent no-fold)
"""
import json
import sys


def main() -> None:
    rnd = int(sys.argv[1])
    args = sys.argv[2:]
    run_paths, prior_paths = [], []
    i = 0
    while i < len(args):
        if args[i] == "--prior":
            i += 1
            if i >= len(args):
                sys.exit("--prior needs a path argument")
            prior_paths.append(args[i])
        elif args[i].startswith("--"):
            sys.exit(f"unknown flag {args[i]}")
        else:
            run_paths.append(args[i])
        i += 1
    if not run_paths:
        sys.exit("need at least one fresh run file")
    runs = [json.load(open(p)) for p in run_paths]
    # contention-prone sub-second keys (r19 verdict ask #3): optionally
    # fold committed prior-round fresh-run samples — unchanged code,
    # same plans. A listed-but-missing prior file FAILS (r20 ADVICE:
    # the old hardcoded list silently stopped folding on relocation
    # while the provenance string still claimed the fold happened).
    noisy = ["ann_ndcg_eval", "q31_range_lookup", "q39_attribution",
             "text_ngram_novelty"]
    prior = [json.load(open(p)) for p in prior_paths]
    keys = set()
    for r in runs:
        keys |= set(r["queries"])
    pinned = {}
    for k in sorted(keys):
        vals = [r["queries"][k] for r in runs if k in r["queries"]]
        if k in noisy or k.split("__")[0] in noisy:
            vals += [r["queries"][k] for r in prior if k in r["queries"]]
        pinned[k] = round(max(vals), 3)
    old = json.load(open("BASELINE.json"))
    b = old["baseline"]
    b["queries"] = pinned
    b["pinned_round"] = rnd
    fold_note = (
        f"; the four contention-prone sub-second keys ({', '.join(noisy)}) "
        f"additionally fold {len(prior)} committed prior fresh-run "
        f"samples ({', '.join(prior_paths)})" if prior else "")
    b["source"] = (
        f"per-key max of {len(runs)} fresh-JVM min-of-3 runs of the "
        f"round-{rnd} build on the build machine "
        f"({', '.join(run_paths)})" + fold_note)
    b["env_fingerprint"] = runs[0]["env"]
    b["total_sec"] = round(sum(pinned.values()), 3)
    json.dump(old, open("BASELINE.json", "w"), indent=None,
              separators=(",", ":"))
    print(f"pinned {len(pinned)} keys, total {b['total_sec']}s, "
          f"round {rnd}")
    for k in noisy:
        print(f"  {k}: {pinned.get(k)}")


if __name__ == "__main__":
    main()
