"""Merge per-level trained-equivalence results from a (possibly still
running) script/int8_equivalence_trained.py log into TOME_EQUIV.json.

The equivalence job prints one JSON line per completed ToMe level but only
writes TOME_EQUIV.json after ALL levels finish (~40 min/level on the
tunnel); a round cut mid-run would lose every completed level. This
harvester lifts the per-level lines from the log incrementally so the
artifact always reflects the evidence that exists.

Run: python script/harvest_trained_levels.py /tmp/equiv_trained_r5b.log
Idempotent; safe to run while the job is still writing the log.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stllm_tpu.ops.tome import MERGE_LEVELS  # noqa: E402

MODEL = ("4096-width 8-layer LLaMA + 1408-width 16-block ViT (full matmul "
         "shapes, reduced depth), trained to emit fixed 16-token answers; "
         "half the videos smooth, half iid noise")


def main():
    log = sys.argv[1] if len(sys.argv) > 1 else "/tmp/equiv_trained_r5b.log"
    levels = {}
    with open(log) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                doc = json.loads(line)
            except json.JSONDecodeError:
                continue
            for k, v in doc.items():
                if k in MERGE_LEVELS and isinstance(v, dict) \
                        and "smooth_video" in v:
                    levels[k] = v
    if not levels:
        print("no completed levels in", log)
        return 1
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tpath = os.path.join(root, "TOME_EQUIV.json")
    tdoc = json.load(open(tpath)) if os.path.exists(tpath) else {}
    # supersedes the round-4 n=8 8-block arms once any deeper arm exists
    tdoc.pop("trained_model_medium", None)
    tdoc.pop("trained_model_t_medium", None)
    sect = tdoc.setdefault("trained_levels", {"model": MODEL,
                                              "levels": {}})
    sect["levels"].update(levels)
    # sample count comes from the job's own per-arm output, never hardcoded
    # (a partial/smoke run with a smaller n must not be mislabeled)
    sect["n_per_subset"] = min(arm["smooth_video"]["n"]
                               for arm in sect["levels"].values())
    done = sorted(sect["levels"])
    missing = sorted(k for k in MERGE_LEVELS if k != "off"
                     and k not in sect["levels"])
    if missing:
        sect["note"] = (f"harvested incrementally from the running "
                        f"equivalence job; levels still pending: {missing}")
    else:
        sect.pop("note", None)
    with open(tpath, "w") as f:
        json.dump(tdoc, f, indent=1)
    print(json.dumps({"harvested": done, "pending": missing}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
