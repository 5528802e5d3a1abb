"""Deterministic synthetic fixtures (FIXTURES.md): image corpus + crawl graph.

Everything here is seeded (numpy PCG64, seed=42 by default), needs no
network and no external data, and is idempotent — same bytes every run.
"""

from olx_spark.fixtures.images import (  # noqa: F401
    decode_image,
    encode_image,
    make_image_corpus,
    phash64,
    png_decode,
    png_encode,
    psnr,
)
from olx_spark.fixtures.crawl_graph import (  # noqa: F401
    CrawlGraph,
    PageStore,
    make_crawl_graph,
)
