import pytest

from crfsuite_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("crfsuite_spark_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def synth():
    from crfsuite_spark.datagen.transcripts import generate

    return generate(n_convs=30, turns_per_conv=10, hot_factor=0, seed=42)


@pytest.fixture(scope="session")
def lexicon_model(synth):
    """Small deterministic lexicon-seeded model (no training)."""
    import numpy as np

    from crfsuite_spark.train.model import CRFModel

    votes = synth.tokens.groupby(["token", "label"]).size().reset_index(name="n")
    labels = sorted(synth.tokens["label"].unique())
    l2i = {l: i for i, l in enumerate(labels)}
    attrs = sorted("token[t]=" + t for t in votes["token"].unique())
    a2i = {a: i for i, a in enumerate(attrs)}
    state_w = np.zeros((len(attrs), len(labels)))
    for r in votes.itertuples():
        state_w[a2i["token[t]=" + r.token], l2i[r.label]] += float(r.n)
    return CRFModel(labels=labels, attrs=attrs, state_w=np.log1p(state_w),
                    trans_w=np.zeros((len(labels), len(labels))))
