"""Generate the checked-in CoNLL-2002-format NER fixture.

Deterministic (seeded) corpus shaped like the reference's CoNLL-2002
Dutch data (R/data.R:49-79 format: ``token pos label`` lines, blank line
between sentences, ``-DOCSTART- -DOCSTART- O`` between documents) with
the properties the real corpus stresses:

- BIO tagging over PER/ORG/LOC/MISC with multi-token entities,
- ambiguous surfaces (e.g. "Washington" is a person after a title and a
  location after a preposition; "Jordan" likewise) so a lexicon alone
  cannot reach the 0.95 gate — context/transition features must work,
- punctuation, numbers, casing variety, entity-free sentences.

Run: ``python tools/make_conll_fixture.py`` (rewrites
tests/fixtures/conll2002_synth.txt; the file is committed, tests only
read it).
"""

import os

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "conll2002_synth.txt")

FIRST = ["Jan", "Piet", "Marie", "Anna", "Koen", "Els", "Bart", "Sofie",
         "Hugo", "Lies", "Tom", "Eva", "Daan", "Nora", "Stef", "Mira"]
LAST = ["Peeters", "Janssens", "Maes", "Claes", "Wouters", "Mertens",
        "Willems", "Goossens", "Vermeulen", "Hendrickx", "Washington",
        "Jordan", "Parijs"]
ORG_CORE = ["Telenet", "Bekaert", "Umicore", "Solvay", "Proximus",
            "Colruyt", "Barco", "Agfa", "Melexis", "Aperam", "Arcelor",
            "Vandelay"]
ORG_SUFFIX = ["NV", "Groep", "Holding", "International"]
LOC = ["Antwerpen", "Gent", "Brussel", "Leuven", "Brugge", "Hasselt",
       "Namen", "Luik", "Oostende", "Mechelen", "Washington", "Jordan",
       "Parijs", "Berlijn", "Londen"]
MISC = ["Ronde", "Oscars", "Wereldbeker", "Europacup", "Grand", "Prix",
        "Olympische", "Spelen"]

# (template tokens, pos tags) — {P}=person {O}=org {L}=loc {M}=misc slots
TEMPLATES = [
    ("De woordvoerder van {O} zei dat {P} naar {L} verhuist .",
     "Art N Prep {O} V Conj {P} Prep {L} V Punc"),
    ("{P} werkt sinds 1998 bij {O} in {L} .",
     "{P} V Prep Num Prep {O} Prep {L} Punc"),
    ("Volgens {P} stijgt de omzet van {O} met 12 procent .",
     "Prep {P} V Art N Prep {O} Prep Num N Punc"),
    ("De burgemeester van {L} opent het kantoor van {O} .",
     "Art N Prep {L} V Art N Prep {O} Punc"),
    ("{O} neemt {O2} over voor 3 miljard euro .",
     "{O} V {O2} Adv Prep Num N N Punc"),
    ("mevrouw {P} sprak gisteren met {P2} over de fusie .",
     "N {P} V Adv Prep {P2} Prep Art N Punc"),
    ("de trein van {L} naar {L2} had vertraging .",
     "Art N Prep {L} Prep {L2} V N Punc"),
    ("{P} wint de {M} in {L} .",
     "{P} V Art {M} Prep {L} Punc"),
    ("de aandelen sloten vrijdag hoger op de beurs .",
     "Art N V N Adj Prep Art N Punc"),
    ("het bedrijf kondigde een herstructurering aan .",
     "Art N V Art N Prep Punc"),
    ("analisten verwachten een moeilijk kwartaal .",
     "N V Art Adj N Punc"),
    ("dhr. {P} vertegenwoordigt {O} in de raad .",
     "N {P} V {O} Prep Art N Punc"),
    ("in {L} protesteerden duizenden mensen tegen het plan .",
     "Prep {L} V Num N Prep Art N Punc"),
    ("{O} verkoopt zijn divisie in {L} aan {O2} .",
     "{O} V Pron N Prep {L} Prep {O2} Punc"),
]


DEFAULT_VOCAB = None  # set below once the lists exist


def sample_entity(rng, kind, vocab=None):
    """Returns (tokens, tags) for one entity mention drawn from
    ``vocab`` = {"first", "last", "org", "loc", "misc"} lists (the
    module defaults when None)."""
    v = vocab or DEFAULT_VOCAB
    if kind.startswith("P"):
        f = v["first"][rng.integers(len(v["first"]))]
        l = v["last"][rng.integers(len(v["last"]))]
        if rng.random() < 0.35:
            return [l], ["B-PER"], ["N"]
        return [f, l], ["B-PER", "I-PER"], ["N", "N"]
    if kind.startswith("O"):
        c = v["org"][rng.integers(len(v["org"]))]
        if rng.random() < 0.45:
            # org suffixes are deliberately SHARED across vocabularies:
            # "NV"/"Groep" are context, not identity
            s = ORG_SUFFIX[rng.integers(len(ORG_SUFFIX))]
            return [c, s], ["B-ORG", "I-ORG"], ["N", "N"]
        return [c], ["B-ORG"], ["N"]
    if kind.startswith("L"):
        return ([v["loc"][rng.integers(len(v["loc"]))]], ["B-LOC"], ["N"])
    m1 = v["misc"][rng.integers(len(v["misc"]))]
    if rng.random() < 0.4 and m1 in ("Grand", "Olympische", "Ronde"):
        pair = {"Grand": "Prix", "Olympische": "Spelen", "Ronde": "Ronde"}[m1]
        return [m1, pair], ["B-MISC", "I-MISC"], ["N", "N"]
    return [m1], ["B-MISC"], ["N"]


# vocab reserved for the generalization fixture's heldout documents:
# NEVER sampled in its training docs, so the tagger must label them from
# context (pos windows, neighbouring tokens, shape) alone
UNSEEN_FIRST = ["Quirin", "Xenia", "Olaf", "Petra"]
UNSEEN_LAST = ["Quackels", "Zylstra", "Vreeburg", "Nackaerts"]
UNSEEN_ORG = ["Zephyrix", "Quantalux", "Nordfab", "Vexicom"]
UNSEEN_LOC = ["Zwevegem", "Quaregnon", "Xhoris", "Vorselaar"]
UNSEEN_MISC = ["Memorial", "Zeskamp", "Veldrit", "Regatta"]

DEFAULT_VOCAB = {"first": FIRST, "last": LAST, "org": ORG_CORE,
                 "loc": LOC, "misc": MISC}
UNSEEN_VOCAB = {"first": UNSEEN_FIRST, "last": UNSEEN_LAST,
                "org": UNSEEN_ORG, "loc": UNSEEN_LOC, "misc": UNSEEN_MISC}


def _emit_docs(rng, n_docs, per_doc, lines, vocab=None):
    for d in range(n_docs):
        lines.append("-DOCSTART- -DOCSTART- O")
        lines.append("")
        for _ in range(per_doc):
            words, poss = TEMPLATES[rng.integers(len(TEMPLATES))]
            out = []
            for w, p in zip(words.split(), poss.split()):
                if w.startswith("{"):
                    kind = w.strip("{}")
                    toks, tags, tps = sample_entity(rng, kind, vocab)
                    for t, g, tp in zip(toks, tags, tps):
                        out.append((t, tp, g))
                else:
                    out.append((w, p, "O"))
            for t, p, g in out:
                lines.append(f"{t} {p} {g}")
            lines.append("")


def main(n_sentences=2000, n_docs=40, seed=7):
    rng = np.random.default_rng(seed)
    lines: list = []
    _emit_docs(rng, n_docs, n_sentences // n_docs, lines)
    with open(os.path.abspath(OUT), "w") as f:
        f.write("\n".join(lines) + "\n")
    n_tok = sum(1 for l in lines if l and not l.startswith("-DOCSTART-"))
    print(f"wrote {os.path.abspath(OUT)}: {n_sentences} sentences, {n_tok} tokens")


def main_unseen(n_train_docs=32, n_test_docs=8, per_doc=50, seed=11):
    """Second fixture: the LAST n_test_docs documents draw every entity
    head from vocabularies absent from the first n_train_docs — the
    generalization split. read_conll doc ids are 1-BASED, so the unseen
    documents are ``doc_id > n_train_docs`` (33..40 by default)."""
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                       "conll2002_synth_unseen.txt")
    rng = np.random.default_rng(seed)
    lines: list = []
    _emit_docs(rng, n_train_docs, per_doc, lines)
    _emit_docs(rng, n_test_docs, per_doc, lines, vocab=UNSEEN_VOCAB)
    with open(os.path.abspath(out), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {os.path.abspath(out)}: {n_train_docs}+{n_test_docs} docs")


if __name__ == "__main__":
    main()
    main_unseen()
