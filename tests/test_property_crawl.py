"""Property-style randomized equality (SURVEY.md §5.2): random crawl
graphs (hosts, ads/page, dup density, counts) -> the engine's
reference-exact mode must match the pure-python simulator exactly.
Seeded-random parameter draws (deterministic across runs)."""

import numpy as np
import pytest

from olx_spark.fixtures import make_crawl_graph
from olx_spark.plans.crawl import CrawlConfig, CrawlEngine
from oracle_sim import simulate_all

CASES = []
_rng = np.random.default_rng(np.random.PCG64(777))
for _case in range(4):
    CASES.append(
        {
            "n_hosts": int(_rng.integers(1, 5)),
            "pages_per_host": int(_rng.integers(1, 4)),
            "ads_lo": int(_rng.integers(1, 4)),
            "ads_hi": int(_rng.integers(5, 15)),
            "hot": int(_rng.integers(1, 4)),
            "seed": int(_rng.integers(0, 10_000)),
            "count_mult": float(_rng.uniform(0.2, 3.0)),
        }
    )


@pytest.mark.parametrize("case", CASES)
def test_random_graph_engine_matches_simulator(spark, tmp_path, case):
    graph = make_crawl_graph(
        n_hosts=case["n_hosts"],
        pages_per_host=case["pages_per_host"],
        ads_per_page=(case["ads_lo"], case["ads_hi"]),
        hot_host_factor=case["hot"],
        seed=case["seed"],
    )
    seeds = [
        dict(s, count=max(1, int(s["count"] * case["count_mult"])) )
        for s in graph.seeds
    ]
    sims = simulate_all(graph.store, seeds)
    eng = CrawlEngine(
        spark,
        graph,
        CrawlConfig(
            checkpoint_dir=str(tmp_path / f"prop_{case['seed']}"),
            with_payload=False,
        ),
    )
    rows = eng.run(seeds).collect()
    by_seed: dict[str, list] = {}
    for r in rows:
        by_seed.setdefault(r["name"], []).append(r)
    for name, sim in sims.items():
        got = sorted(
            ((r["seq"], r["round"], r["pos"], r["href"], r["brief_flat"])
             for r in by_seed.get(name, [])),
        )
        want = sorted(
            (r["seq"], r["round"], r["pos"], r["href"], r["brief_flat"])
            for r in sim.results
        )
        assert got == want, f"mismatch for {name} in case {case}"
