"""Real-world OOV eval for the trained LTS (VERDICT r3 next-step #6).

The LTS's published 91.3% held-out number comes from a RANDOM CMUdict
split, which flatters it: random held-out words are mostly regular
English. Real serving OOVs skew toward proper nouns — surnames, places,
brands — with irregular letter-to-sound mappings. This eval scores the
full hybrid (morphology rules + LTS, text/lts.py::predict_pron) on a
curated name-like subset of CMUdict, with each eval word REMOVED from
the lookup dictionary (so the prediction is a true OOV path), against
the CMUdict truth.

Usage: python scripts/eval_lts_oov.py  (prints stressed + stress-free
phone agreement; numbers recorded in PARITY.md)
"""
import sys

sys.path.insert(0, "/root/repo")

# Curated, reference-independent list: common US/international surnames,
# place names, and brand-like words. Only entries present in CMUdict are
# scored (membership filtered at runtime).
CANDIDATES = """
nguyen kowalski schwarzenegger gonzalez hernandez villanueva castellano
petrovic ivanov volkov yamamoto takahashi kobayashi watanabe fujimoto
chavez ramirez vasquez gutierrez fernandez rodriguez dominguez velasquez
o'brien o'connor mcdonald mcgregor macleod fitzgerald callahan sullivan
murphy gallagher donovan brennan flanagan shaughnessy
goldberg rosenberg steinberg weinstein bernstein rothschild lieberman
schneider schroeder mueller zimmerman hoffman kaufman
albuquerque worcester tucson spokane schenectady poughkeepsie
milwaukee cincinnati sacramento minneapolis tallahassee chattanooga
monongahela susquehanna winnipeg saskatchewan mississauga
marseille copenhagen edinburgh gloucester leicester warwick greenwich
islamabad kathmandu ouagadougou guadalajara montevideo bucharest
ljubljana reykjavik vladivostok novosibirsk dnepropetrovsk
nike adidas toyota nintendo samsung hyundai porsche volkswagen
ikea nokia lufthansa nestle heineken carlsberg michelin
pfizer novartis astrazeneca glaxo roche merck
xerox kodak polaroid motorola texaco exxon chevron
google yahoo cisco oracle intel nvidia adobe
armani versace gucci prada chanel givenchy yves
stradivarius paganini tchaikovsky rachmaninoff shostakovich mussorgsky
dvorak sibelius berlioz debussy
aaliyah beyonce shakira rihanna madonna
kierkegaard nietzsche wittgenstein schopenhauer dostoevsky tolstoy
solzhenitsyn nabokov turgenev chekhov
montague capulet gatsby ahab ishmael quixote
anakin chewbacca gandalf frodo voldemort hermione
"""


def main():
    import gzip
    import os
    import pickle

    from jyutvoice_tpu.text import lts
    from jyutvoice_tpu.text.english import get_dict

    entries = get_dict()  # UPPERCASE word -> syllable lists
    if not entries:
        print("cmudict not found; set JYUTVOICE_CMUDICT")
        return 1

    words = sorted({
        w.strip().lower() for w in CANDIDATES.split() if w.strip()
    })
    # a model trained on full CMUdict has SEEN these words (the shipped
    # artifact holds out only a random 5%): an honest OOV number needs a
    # model trained with the eval set excluded. Cached — retraining takes
    # minutes.
    cache = "/tmp/lts_model_no_names.pkl.gz"
    if os.path.exists(cache):
        with gzip.open(cache, "rb") as f:
            model = pickle.load(f)
    else:
        excl = {w.upper() for w in words}
        train_entries = {k: v for k, v in entries.items() if k not in excl}
        print(f"retraining LTS without the {len(excl)} eval words "
              f"({len(train_entries)} entries)...", flush=True)
        model, _ = lts.train(train_entries, iterations=3, holdout=0.0)
        with gzip.open(cache, "wb") as f:
            pickle.dump(model, f)

    present = [w for w in words if w.upper() in entries]
    missing = [w for w in words if w.upper() not in entries]
    heldout = [(w, lts._word_phones(entries[w.upper()])) for w in present]
    # remove eval words from the lookup dict so predict_pron takes the
    # true OOV path (morphology stems may still hit other dict words —
    # that IS the production hybrid); same pattern as lts.main
    held_set = {w for w, _ in heldout}
    eval_dict = {
        k: v for k, v in entries.items() if k.lower() not in held_set
    }

    acc_stress = lts.phone_accuracy(model, heldout, eval_dict, stress=True)
    acc_free = lts.phone_accuracy(model, heldout, eval_dict, stress=False)
    acc_lts_only = lts.phone_accuracy(model, heldout, stress=False)
    print(f"candidates: {len(words)}  in-dict (scored): {len(present)}  "
          f"not-in-dict: {len(missing)}")
    print(f"name-like OOV phone agreement: stressed {acc_stress:.3f}  "
          f"stress-free {acc_free:.3f}  (LTS-only stress-free "
          f"{acc_lts_only:.3f})")

    # per-word agreement for error analysis (same edit-distance scoring
    # as phone_accuracy, computed per word)
    def agree(want, got):
        want = [lts._base(p) for p in want]
        got = [lts._base(p) for p in got]
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

    scored = [
        (w, want, lts.predict_pron(w, eval_dict, model))
        for w, want in heldout
    ]
    bad = [(w, want, got, agree(want, got)) for w, want, got in scored]
    bad = [s for s in bad if s[3] < 0.5]
    if bad:
        print(f"\nworst (stress-free agreement < 0.5): {len(bad)}")
        for w, want, got, a in sorted(bad, key=lambda s: s[3])[:15]:
            print(f"  {w:18s} {a:.2f}  want {' '.join(want)}  got {' '.join(got)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
