"""Mechanical guard for artifact-first honesty (round-4 verdict item 4).

Every headline figure quoted in README/docs must come from a committed
artifact JSON; round 4 shipped three drifts (streaming 7.1/27.7ms vs the
artifact's 10.4/43.3; strong-scaling 0.76@8 vs 0.725; a hand-synced
102e6 calibration vs the artifact's 108.3e6).  This tool re-extracts the
quoted figures with anchored regexes and diffs them against the newest
artifacts; non-zero exit on any mismatch.  Run at round end (and any time
docs are edited):

    python tools/check_doc_numbers.py

Checks are declarative: (doc, regex-with-one-capture, artifact value,
rel tolerance).  The regexes anchor on stable phrasing around each
figure; if a doc sentence is reworded, the check fails loudly (missing
match) rather than silently going stale — rewire the regex with the new
phrasing.  Figures explicitly labelled as historical ("round 4:",
"round-3", a dated parenthetical) are exempt by construction: the
regexes only match the CURRENT-figure phrasings.
"""
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest(pattern):
    paths = sorted(glob.glob(os.path.join(REPO, pattern)))
    return paths[-1] if paths else None


def load_bench():
    p = newest("BENCH_r*.json")
    if p is None:
        return None, None
    with open(p) as f:
        d = json.load(f)
    return d.get("parsed") or json.loads(d["tail"].strip()), p


def load_json(pattern):
    p = newest(pattern)
    if p is None:
        return None, None
    with open(p) as f:
        return json.load(f), p


def main():
    bench, bench_p = load_bench()
    serving, serving_p = load_json("SERVING_r*.json")
    failures = []
    checks = []

    def add(doc, regex, want, tol=0.015, src=""):
        checks.append((doc, regex, float(want), tol, src))

    if bench:
        eps_m = bench["value"] / 1e6
        # README headline: "**<X>M edges/s on one TPU v5e chip**"
        add("README.md",
            r"\*\*(\d+(?:\.\d+)?)M edges/s on one TPU v5e chip\*\*",
            eps_m, src=bench_p)
        # README kernel table rows (anchored per row label)
        add("README.md",
            r"Sketch propagation \(fused MinHash\+HLL, 3\.2M edges\) \| "
            r"\*\*(\d+(?:\.\d+)?)M edges/s\*\*",
            eps_m, src=bench_p)
        ch = bench.get("chunked")
        if ch:
            add("README.md",
                r"Sketch propagation, chunk-streamed[^|]*\| "
                r"\*\*(\d+(?:\.\d+)?)M edges/s",
                ch["edges_per_s"] / 1e6, src=bench_p)
        sp = bench.get("spmm")
        if sp:
            add("README.md",
                r"SpMM d=128 via static plan \| \*\*(\d+(?:\.\d+)?)M "
                r"edges/s\*\*",
                sp["edges_per_s"] / 1e6, src=bench_p)
    if serving:
        ss = serving.get("streaming_steady")
        if ss:
            b = next(iter(ss["batches"].values()))
            bsz = next(iter(ss["batches"]))
            # README serving row: "insert p50 **<X>ms** / delete <Y>ms at
            # B=<batch>"
            add("README.md",
                r"insert p50 \*\*(\d+(?:\.\d+)?)ms\*\* / delete "
                r"\d+(?:\.\d+)?ms at B=" + bsz,
                b["insert_p50_ms_net"], src=serving_p)
            add("README.md",
                r"insert p50 \*\*\d+(?:\.\d+)?ms\*\* / delete "
                r"(\d+(?:\.\d+)?)ms at B=" + bsz,
                b["delete_p50_ms_net"], src=serving_p)
        ss1m = serving.get("streaming_steady_1m")
        if ss1m:
            b = ss1m["batches"]["64"]
            if b.get("insert_p50_ms_net") is not None:
                add("README.md",
                    r"1M nodes / 8M edges: insert (\d+(?:\.\d+)?)ms / "
                    r"delete \d+(?:\.\d+)?ms at B=64",
                    b["insert_p50_ms_net"], src=serving_p)
            if b.get("delete_p50_ms_net") is not None:
                add("README.md",
                    r"1M nodes / 8M edges: insert \d+(?:\.\d+)?ms / delete "
                    r"(\d+(?:\.\d+)?)ms at B=64",
                    b["delete_p50_ms_net"], src=serving_p)
        dec = serving.get("decomposition_262k")
        if dec:
            add("README.md",
                r"device compute is \*\*(\d+(?:\.\d+)?)M links/s at "
                r"B=262k\*\*",
                dec["links_per_s_device"] / 1e6, src=serving_p)

    quality, quality_p = load_json("QUALITY_r*.json")
    if quality:
        for row, regex in (
            ("buddy-synth-ws",
             r"\(BUDDY\) \| Hits@50 = \*\*(\d+(?:\.\d+)?) ±"),
            ("elph-synth-ws",
             r"\(ELPH\) \| Hits@50 = \*\*(\d+(?:\.\d+)?) ±"),
            ("seal-dgcnn-synth-ws",
             r"SEAL DGCNN \(best tier\), 10 reps \| Hits@50 = "
             r"\*\*(\d+(?:\.\d+)?) ±"),
        ):
            v = (quality.get(row) or {}).get("test_mean")
            if v is not None:
                add("README.md", regex, v, tol=0.001, src=quality_p)

    scaling, scaling_p = load_json("SCALING_r*.json")
    if scaling:
        m = scaling.get("ici_model", {})
        def eff(row, dc):
            try:
                return m[row]["per_device_count"][dc]["efficiency"]
            except KeyError:
                return None
        rate = (m.get("strong_random", {}).get("assumptions", {})
                .get("per_chip_edges_per_s"))
        if rate:
            add("docs/PARALLELISM.md",
                r"artifact rate \((\d+(?:\.\d+)?)M e/s,\s+SCALING_r",
                rate / 1e6, tol=0.001, src=scaling_p)
        ws8 = eff("strong_ws_shuffled", "8")
        rnd8 = eff("strong_random", "8")
        if ws8 is not None:
            add("docs/PARALLELISM.md",
                r"ws-shuffled strong scaling is\s+(0\.\d+) @ 8",
                round(ws8, 2), tol=0.011, src=scaling_p)
        if rnd8 is not None:
            add("docs/PARALLELISM.md",
                r"random graphs reach\s+(0\.\d+) @ 8",
                round(rnd8, 2), tol=0.011, src=scaling_p)

    # the scaling model's calibration constant must self-load the newest
    # BENCH artifact (code check, not prose)
    sys.path.insert(0, REPO)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from subgraph_sketching_tpu.parallel.scaling import bench_artifact_rate
    if bench and abs(bench_artifact_rate() - bench["value"]) > 1:
        failures.append(
            f"scaling.bench_artifact_rate() = {bench_artifact_rate()} != "
            f"newest BENCH value {bench['value']}")

    for doc, regex, want, tol, src in checks:
        path = os.path.join(REPO, doc)
        with open(path) as f:
            text = f.read()
        ms = re.findall(regex, text)
        if not ms:
            failures.append(f"{doc}: no match for /{regex}/ "
                            f"(expected ~{want:g} from {os.path.basename(src)})")
            continue
        for m in ms:
            got = float(m)
            if abs(got - want) > tol * max(abs(want), 1e-9):
                failures.append(
                    f"{doc}: quotes {got:g}, artifact "
                    f"{os.path.basename(src)} says {want:g} (/{regex}/)")

    if failures:
        print("DOC-NUMBER DRIFT:")
        for f_ in failures:
            print("  -", f_)
        return 1
    print(f"doc numbers consistent with artifacts "
          f"({len(checks)} checks + calibration)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
