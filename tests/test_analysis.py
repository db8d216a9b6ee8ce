"""Porter stemmer pinned to classic END-TO-END vectors (the widely
reproduced demo set of the reference implementation — full-pipeline
outputs, unlike the paper's per-step tables — plus end-to-end pairs
derivable from the paper's own examples), and to the toy CIFF
fixture's stems."""

from __future__ import annotations

import pyarrow as pa

E2E_VECTORS = {
    # the classic demo set
    "caresses": "caress", "flies": "fli", "dies": "di", "mules": "mule",
    "denied": "deni", "died": "di", "agreed": "agre", "owned": "own",
    "humbled": "humbl", "sized": "size", "meeting": "meet",
    "stating": "state", "siezing": "siez", "itemization": "item",
    "sensational": "sensat", "traditional": "tradit",
    "reference": "refer", "colonizer": "colon", "plotted": "plot",
    # full-pipeline outputs of paper examples
    "caress": "caress", "cats": "cat", "ponies": "poni",
    "motoring": "motor", "sing": "sing", "hopping": "hop",
    "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file",
    "happy": "happi", "sky": "sky", "roll": "roll",
    # the toy CIFF fixture's stemmed terms
    # (/root/reference/tests/toy.rs:38: "simpl", "veri")
    "simple": "simpl", "very": "veri",
}


def test_porter_e2e_vectors():
    from ciff_ray.analysis import porter_stem

    bad = {
        w: (porter_stem(w), want)
        for w, want in E2E_VECTORS.items()
        if porter_stem(w) != want
    }
    assert not bad, bad


def test_porter_not_applied_twice():
    """Porter is NOT idempotent ("agre" -> "agr"); the engine must
    therefore stem exactly once — build stems the token dictionary,
    query stems raw query tokens, and stored terms are never re-stemmed
    (LocalScorer looks stems up verbatim).  This pins the known
    non-idempotent example so nobody 'simplifies' to re-stemming."""
    from ciff_ray.analysis import porter_stem

    assert porter_stem("agreed") == "agre"
    assert porter_stem("agre") == "agr"  # would corrupt a re-stemmed index


def test_porter_short_words_untouched():
    from ciff_ray.analysis import porter_stem

    for w in ("a", "is", "be", "by", "02"):
        assert porter_stem(w) == w


def test_analyze_dictionary_merges_variants():
    from ciff_ray.analysis import analyze_dictionary

    d = pa.array(["tables", "table", "filing", "file", "sky"])
    new_dict, remap = analyze_dictionary(d, "porter")
    stems = new_dict.to_pylist()
    assert remap.shape == (5,)
    # tables/table and filing/file collapse to shared stems
    assert stems[remap[0]] == stems[remap[1]] == "tabl"
    assert stems[remap[2]] == stems[remap[3]] == "file"
    assert stems[remap[4]] == "sky"
    assert len(stems) == len(set(stems)) == 3
