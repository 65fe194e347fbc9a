"""Porter stemmer vs canonical examples from the published spec, plus
nltk's NLTK_EXTENSIONS deviations (the mode the reference uses via
nltk.PorterStemmer — shared/tokenizer.py:51)."""

from web_crawler_search_engine_spark.functions.stemming import stem

# forms where NLTK_EXTENSIONS diverges from the 1980 spec; expected
# values are nltk.stem.PorterStemmer().stem outputs
NLTK_DIVERGENT_VECTORS = {
    # irregular-form pool
    "skies": "sky", "sky": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "news": "news", "innings": "inning",
    "outings": "outing", "cannings": "canning", "howe": "howe",
    "proceed": "proceed", "exceed": "exceed", "succeed": "succeed",
    # step 1a: 4-letter -ies keeps the e (spec: 'ti')
    "ties": "tie", "dies": "die", "pies": "pie",
    # step 1b: -ied path (spec would run the ed machinery)
    "died": "die", "spied": "spi", "tried": "tri", "replied": "repli",
    # step 1c: consonant-before-y condition (spec: contains-vowel,
    # which would give enjoi / sai / boi)
    "enjoy": "enjoy", "say": "say", "boy": "boy", "cry": "cri",
    "happy": "happi",
}


def test_nltk_extension_vectors():
    bad = {
        w: (stem(w), want)
        for w, want in NLTK_DIVERGENT_VECTORS.items()
        if stem(w) != want
    }
    assert not bad, bad

SPEC_VECTORS = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "caress": "caress", "cats": "cat",
    # step 1b
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "radicalli": "radic", "differentli": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "communism": "commun", "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


def test_spec_vectors():
    bad = {w: (stem(w), want) for w, want in SPEC_VECTORS.items() if stem(w) != want}
    assert not bad, bad


def test_idempotent_on_short_and_stemmed():
    for w in ["a", "be", "the", "cat", "run"]:
        assert stem(stem(w)) == stem(w)


def test_lowercases():
    assert stem("Caresses") == "caress"
