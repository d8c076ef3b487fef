"""Measure candidate borrowing-pattern rules for the LTS hybrid.

Round-4 VERDICT #7: the name-like OOV eval's worst errors are irregular
BORROWINGS (worcester, tucson, nguyen) — grapheme clusters whose sound
follows the source language, not English letter-to-sound statistics. The
decision-list LTS can't learn them (too few training examples per
cluster, conflicting regular neighbors).

Mitigation candidates: anchored grapheme-cluster rules (suffix/prefix)
that pronounce the cluster with fixed phones and recurse the hybrid on
the remainder. Same selection discipline as the morphology layer
(text/lts.py::_FIXED_SUFFIXES): each rule is measured on ALL CMUdict
words matching the pattern (name-eval words excluded from selection so
the later eval stays honest) and kept ONLY if it beats the plain hybrid
on those words. Rules that measure worse are published as negatives.

Usage:
  python scripts/eval_lts_borrowings.py            # measure candidates
  python scripts/eval_lts_borrowings.py --holdout  # memorization-honest
  python scripts/eval_lts_borrowings.py --apply    # also print the kept
                                                   # rule tuple for lts.py

MEASURED CONCLUSION (round 5): a three-stage negative.
  (a) leave-one-out, full model: all 16 candidates LOSE — clusters with
      training support are already learned (mc- 0.970 vs rule 0.856,
      -berg 0.992 vs 0.964, -eaux 0.975 vs 0.852, ...).
  (b) --holdout (retrained without the scored words): 14 lose; -oux
      (0.741->0.796, n=9) and -ov (0.801->0.833, n=38) win marginally.
  (c) shipping those two regressed the production-model name eval
      (ivanov: English "Ivan" stem hijacks the recursion; nabokov,
      giroux): the holdout winners only beat a CLUSTER-STARVED model,
      a condition the shipped full-CMUdict model is never in.
So text/lts.py ships NO borrowing rules (see its comment). The residual
name-like errors (worcester/tucson/nguyen/quixote/yves) are singleton
irregulars — no sub-word rule generalizes to them, and in production
each is a dictionary hit.
"""
import argparse
import gzip
import os
import pickle
import sys

sys.path.insert(0, "/root/repo")

# (name, kind, grapheme, phones) — kind: "suffix" | "prefix".
# Sourced from the round-4 error analysis (eval_lts_oov.py worst list)
# plus the classic English-borrowing clusters; every rule faces the same
# measured keep/drop gate regardless of provenance.
CANDIDATES = [
    # -cester: Worcester/Gloucester/Leicester — "cester" -> S T ER,
    # preceding r silent (wor-cester -> W UH S T ER)
    ("cester", "suffix", "rcester", ["S", "T", "ER0"]),
    ("cester2", "suffix", "cester", ["S", "T", "ER0"]),
    # French -eaux/-eau/-oux
    ("eaux", "suffix", "eaux", ["OW0"]),
    ("eau", "suffix", "eau", ["OW0"]),
    ("oux", "suffix", "oux", ["UW0"]),
    # Spanish -ez (gonzalez, ramirez): EH Z, not IY Z
    ("ez", "suffix", "ez", ["EH0", "Z"]),
    # German/Yiddish -stein: S T AY N (bernstein, weinstein)
    ("stein", "suffix", "stein", ["S", "T", "AY0", "N"]),
    # -berg is regular (goldberg) — include to confirm the LTS already
    # handles it (expected negative)
    ("berg", "suffix", "berg", ["B", "ER0", "G"]),
    # English place -wich: w usually silent (greenwich) but NOT in
    # norwich/sandwich-class words — measurement decides
    ("wich", "suffix", "wich", ["IH0", "CH"]),
    # -ough in borough/edinburgh class: ER AH? too variable — skip (would
    # need word-level context); not a candidate.
    # Gaelic prefix Mc/Mac: M AH K
    ("mc", "prefix", "mc", ["M", "AH0", "K"]),
    # Vietnamese Ng- onset (nguyen): approximated N before u
    ("ngu", "prefix", "nguy", ["N", "W", "IH1"]),
    # Slavic -owski/-evski: AO F S K IY / EH F S K IY
    ("owski", "suffix", "owski", ["AW0", "S", "K", "IY0"]),
    # Japanese/Italian final -e pronounced (nestle, porsche handled by
    # schwa): -sche -> SH AH (porsche, nietzsche)
    ("sche", "suffix", "sche", ["SH", "AH0"]),
    # Russian -ov/-ev: AA V / EH V (ivanov, volkov) — LTS may say AH V
    ("ov", "suffix", "ov", ["AA0", "V"]),
    # Greek/Latin x- onset: Z (xerox, xavier)
    ("x", "prefix", "x", ["Z"]),
    # Slavic Tch- onset: CH (tchaikovsky)
    ("tch", "prefix", "tch", ["CH"]),
]


def agree(want, got, _base):
    want = [_base(p) for p in want]
    got = [_base(p) for p in got]
    n, m = len(want), len(got)
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + (want[i - 1] != got[j - 1]))
    return max(0, n - d[n][m]) / max(n, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--apply", action="store_true")
    ap.add_argument("--min-words", type=int, default=8,
                    help="min matching CMUdict words for a rule to be "
                    "considered (below: too thin to trust)")
    ap.add_argument("--holdout", action="store_true",
                    help="honest variant: retrain ONE model excluding a "
                    "random half of every rule's matched words and score "
                    "only the excluded half — removes the memorization "
                    "confound (the default leave-one-out removes the word "
                    "from the DICT at predict time but the model still "
                    "trained on it)")
    args = ap.parse_args()

    from jyutvoice_tpu.text import lts
    from jyutvoice_tpu.text.english import get_dict

    # reuse eval_lts_oov's no-names model so selection never sees the
    # eval words through the model either
    import importlib.util as iu

    spec = iu.spec_from_file_location(
        "eval_lts_oov",
        os.path.join(os.path.dirname(__file__), "eval_lts_oov.py"),
    )
    oov = iu.module_from_spec(spec)
    spec.loader.exec_module(oov)
    eval_names = {w.strip().lower() for w in oov.CANDIDATES.split() if w.strip()}

    entries = get_dict()
    if not entries:
        print("cmudict not found")
        return 1
    cache = "/tmp/lts_model_no_names.pkl.gz"
    if os.path.exists(cache):
        with gzip.open(cache, "rb") as f:
            model = pickle.load(f)
    else:
        excl = {w.upper() for w in eval_names}
        train_entries = {k: v for k, v in entries.items() if k not in excl}
        print(f"retraining LTS without {len(excl)} eval words...", flush=True)
        model, _ = lts.train(train_entries, iterations=3, holdout=0.0)
        with gzip.open(cache, "wb") as f:
            pickle.dump(model, f)

    def rule_matches(kind, graph):
        out = []
        for w_up, entry in entries.items():
            w = w_up.lower()
            if w in eval_names or not w.isalpha():
                continue
            if kind == "suffix" and w.endswith(graph) and len(w) - len(graph) >= 2:
                out.append((w, lts._word_phones(entry)))
            elif kind == "prefix" and w.startswith(graph) and len(w) - len(graph) >= 2:
                out.append((w, lts._word_phones(entry)))
        return out

    held_out_by_rule = {}
    if args.holdout:
        import numpy as np

        rng = np.random.default_rng(0)
        excluded = set()
        for name, kind, graph, phones in CANDIDATES:
            ws = sorted(w for w, _ in rule_matches(kind, graph))
            half = set(
                np.asarray(ws)[rng.permutation(len(ws))[: len(ws) // 2]]
            )
            held_out_by_rule[name] = half
            excluded |= half
        hcache = "/tmp/lts_model_borrow_holdout.pkl.gz"
        if os.path.exists(hcache):
            with gzip.open(hcache, "rb") as f:
                model = pickle.load(f)
        else:
            excl_up = {w.upper() for w in excluded} | {
                w.upper() for w in eval_names
            }
            train_entries = {
                k: v for k, v in entries.items() if k not in excl_up
            }
            print(f"retraining LTS without {len(excl_up)} held-out words "
                  f"({len(train_entries)} entries)...", flush=True)
            model, _ = lts.train(train_entries, iterations=3, holdout=0.0)
            with gzip.open(hcache, "wb") as f:
                pickle.dump(model, f)
        print(f"holdout mode: {len(excluded)} words excluded from training",
              flush=True)

    kept = []
    for name, kind, graph, phones in CANDIDATES:
        matches = rule_matches(kind, graph)
        if args.holdout:
            matches = [
                (w, p) for w, p in matches if w in held_out_by_rule[name]
            ]
        if len(matches) < args.min_words:
            print(f"{name:8s} {kind:6s} '{graph}': only {len(matches)} "
                  f"matches — skipped (too thin)")
            continue

        base_sum = rule_sum = 0.0
        for w, want in matches:
            # leave-one-out via pop/restore (a full dict copy per word is
            # ~10 ms x thousands); morphology stems still hit the rest
            saved = entries.pop(w.upper())
            try:
                base = lts.predict_pron(w, entries, model)
                rest = w[: -len(graph)] if kind == "suffix" else w[len(graph):]
                rest_pron = lts.predict_pron(rest, entries, model)
            finally:
                entries[w.upper()] = saved
            got = (rest_pron + phones) if kind == "suffix" else (phones + rest_pron)
            base_sum += agree(want, base, lts._base)
            rule_sum += agree(want, got, lts._base)
        nb, nr = base_sum / len(matches), rule_sum / len(matches)
        verdict = "KEEP" if nr > nb + 0.01 else "drop"
        print(f"{name:8s} {kind:6s} '{graph}' -> {' '.join(phones):16s} "
              f"n={len(matches):4d}  hybrid {nb:.3f}  rule {nr:.3f}  {verdict}")
        if verdict == "KEEP":
            kept.append((name, kind, graph, phones, len(matches), nb, nr))

    if args.apply and kept:
        print("\n# measured winners for text/lts.py::_BORROWING_RULES:")
        for name, kind, graph, phones, n, nb, nr in kept:
            print(f'    ("{graph}", "{kind}", {tuple(phones)!r}),'
                  f'  # {name}: {nb:.3f} -> {nr:.3f} on n={n}')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
