"""Engine vs reference-simulator equality: crawl order, seen set, payload.

The north_rule's correctness gate: the Spark engine in reference-exact
mode must reproduce the reference's crawl ordering (== ADS.ID insert
order) and URL-seen set under the same seed list.
"""

import numpy as np
import pytest

from olx_spark.fixtures.images import decode_image, psnr
from olx_spark.plans.crawl import CrawlConfig, CrawlEngine


@pytest.fixture(scope="module")
def engine_run(spark, crawl_graph, tmp_path_factory):
    eng = CrawlEngine(
        spark,
        crawl_graph,
        CrawlConfig(
            mode="reference",
            checkpoint_dir=str(tmp_path_factory.mktemp("crawl_ckpt")),
        ),
    )
    df = eng.run(crawl_graph.seeds)
    rows = df.collect()
    by_seed: dict[str, list] = {}
    for r in rows:
        by_seed.setdefault(r["name"], []).append(r)
    for lst in by_seed.values():
        lst.sort(key=lambda r: r["seq"])
    return eng, by_seed


def test_crawl_order_exact(engine_run, sim_results):
    _, by_seed = engine_run
    assert set(by_seed) == set(sim_results)
    for name, sim in sim_results.items():
        got = [(r["seq"], r["round"], r["pos"], r["href"]) for r in by_seed[name]]
        want = [
            (r["seq"], r["round"], r["pos"], r["url"]) for r in sim.crawl_order
        ]
        assert got == want, f"crawl order mismatch for {name}"


def test_seen_set_exact(engine_run, sim_results):
    eng, _ = engine_run
    seen = eng.seen_urls().collect()
    got: dict[str, set] = {}
    for r in seen:
        got.setdefault(r["name"], set()).add(r["href"])
    for name, sim in sim_results.items():
        assert got.get(name, set()) == set(sim.seen_urls), name


def test_parsed_fields_exact(engine_run, sim_results):
    _, by_seed = engine_run
    for name, sim in sim_results.items():
        for got, want in zip(by_seed[name], sim.results):
            assert got["title"] == want["title"]
            assert got["description"] == want["title"]  # reference quirk
            assert got["price"] == want["price"]
            assert got["brief_flat"] == want["brief_flat"]
            assert got["image_id"] == want["image_id"]


def test_payload_invariant(engine_run, crawl_graph):
    """input_hint: decoded pixels vs the TRUE (pre-encode) fixture
    pixels — exact for lossless fmt, PSNR >= 40 dB for lossy — plus
    caption and phash equality. Both branches must actually execute
    (the lossy dctq codec exists precisely so the >=40dB branch isn't
    dead code in a JPEG-less sandbox)."""
    from olx_spark.fixtures.images import image_index_from_id, original_pixels

    _, by_seed = engine_run
    images = crawl_graph.images_by_id()
    checked = {"lossless": 0, "lossy": 0}
    for rows in by_seed.values():
        for r in rows[:20]:
            truth = images[r["image_id"]]
            assert r["caption"] == truth["caption"]
            assert r["phash"] == truth["phash"]
            got_px = decode_image(bytes(r["image_bytes"]), r["fmt"])
            _, _, true_fmt, true_px = original_pixels(
                image_index_from_id(r["image_id"]), seed=crawl_graph.image_seed
            )
            assert r["fmt"] == true_fmt
            if r["fmt"] in ("raw", "png"):  # lossless: exact
                assert np.array_equal(got_px, true_px)
                checked["lossless"] += 1
            else:  # lossy: close but NOT identical (genuinely lossy)
                assert psnr(got_px, true_px) >= 40.0
                assert not np.array_equal(got_px, true_px)
                checked["lossy"] += 1
    assert checked["lossless"] > 0
    assert checked["lossy"] > 0, "lossy branch never executed"


def test_fetch_log_lineage(engine_run):
    eng, by_seed = engine_run
    log = eng.fetch_log().collect()
    n_results = sum(len(v) for v in by_seed.values())
    assert len(log) == n_results
    assert all(r["status"] == "OK" for r in log)
    assert all(r["partition_id"] is not None for r in log)
    assert all(r["elapsed_ms"] >= 0 for r in log)
