"""The r11 shared-warmup-fit serving probes never diverge from their
fit-included twins: docs_lang_classifier_probe row-identical to
docs_lang_classifier, and the shared _als_model keeps the fold-in
convergence contract the private fits used to pin."""

SF = "/root/testdata/sf0.001"


def test_lang_probe_matches_in_query(spark):
    """Probe (cached fit) and in-query entry share the marked frame,
    split, and hyperparameters — rows must be identical, or the probe
    is no longer 'docs_lang_classifier amortized'."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    full = q["docs_lang_classifier"](spark, SF).collect()
    probe = q["docs_lang_classifier_probe"](spark, SF).collect()
    assert [tuple(r) for r in full] == [tuple(r) for r in probe]
    assert len(full) > 0


def test_als_shared_model_foldin_contract(spark):
    """rec_als_foldin_check served from the shared explicit model
    (max_iter=8, same as the former private fit) must still show the
    half-step reproducing trained factors at convergence, and the
    served top-k must read pure factor joins (no fit inside)."""
    import time

    import __spark_entry__ as entrymod

    q = entrymod.queries()
    errs = {r.userid: r.rel_err
            for r in q["rec_als_foldin_check"](spark, SF).collect()}
    assert errs and max(errs.values()) < 0.05
    # second consumer of the same cached fit is serve-only: the
    # factor join + top-k must come back far faster than an MLlib fit
    t0 = time.perf_counter()
    rows = q["rec_als_served"](spark, SF).collect()
    assert len(rows) == 20
    assert time.perf_counter() - t0 < 15
