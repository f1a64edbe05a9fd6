#!/usr/bin/env bash
# End-to-end web-crawl + document ingest from the CLI — the rounds
# 9-10 harvest edges, operable exactly like the curation verbs
# (examples/curation_demo.sh is the downstream half).
#
# The demo synthesizes its own tiny inputs with python so it runs in
# any checkout with the bundled test data; swap the synthesized
# parquets for real WARC segments / archive shards / feed polls on a
# cluster.
set -euo pipefail

OUT=${1:-/tmp/crawl_demo}
mkdir -p "$OUT"

if ! command -v minerva-spark >/dev/null; then
  minerva-spark() { python -m minerva_etl_spark.cli "$@"; }
fi

# 0. Synthesize a tiny crawl: real record-gzipped WARC files, a
#    robots table, a sitemap poll, an RSS poll, a PDF-in-archive
#    delivery.  Everything below this block is pure CLI.
python - "$OUT" <<'PY'
import sys

from minerva_etl_spark.operators.multimodal import synthesize_png  # noqa: F401 (session warm)
from minerva_etl_spark.operators.pdf import synthesize_pdf
from minerva_etl_spark.session import get_spark
from minerva_etl_spark.sources.archive import write_archives
from minerva_etl_spark.sources.warc import write_warc_files

out = sys.argv[1]
spark = get_spark(app_name="crawl_demo_setup")
pages = [
    (f"seg-{i % 2}.warc.gz", f"rec-{i:04d}", f"https://demo.test/p/{i}",
     "2026-02-03T04:05:06Z",
     f"<html><head><title>P{i}</title></head><body><p>page {i} text "
     f"{'lorem ipsum ' * 30}</p></body></html>".encode(),
     200, "text/html")
    for i in range(8)
]
spark.createDataFrame(
    pages, "warc_file string, record_id string, target_uri string, "
           "warc_date string, body binary, http_status int, "
           "http_content_type string",
).createOrReplaceTempView("staged")
write_warc_files(spark.table("staged"), f"{out}/warc").collect()

spark.createDataFrame(
    [("demo.test",
      "User-agent: *\nDisallow: /private/\n"
      "Sitemap: https://demo.test/sitemap.xml")],
    "host string, robots_txt string",
).write.mode("overwrite").parquet(f"{out}/robots")

sm = "<urlset>" + "".join(
    f"<url><loc>https://demo.test/p/{i}</loc></url>" for i in range(8)
) + "<url><loc>https://demo.test/private/x</loc></url></urlset>"
spark.createDataFrame([(1, sm)], "sitemap_id bigint, xml string") \
    .write.mode("overwrite").parquet(f"{out}/sitemaps")

rss = ("<rss><channel><title>Demo</title>"
       "<item><title>new</title><link>https://demo.test/p/99</link>"
       "</item></channel></rss>")
spark.createDataFrame([(1, rss)], "feed_id bigint, xml string") \
    .write.mode("overwrite").parquet(f"{out}/feeds")

members = [
    ("books.tar.gz", f"doc_{i}.pdf",
     synthesize_pdf([f"Book {i}", "body text " * 40], title=f"Book {i}"))
    for i in range(4)
]
spark.createDataFrame(
    members, "archive string, member string, content binary"
).createOrReplaceTempView("m")
write_archives(spark.table("m"), f"{out}/archives").collect()
PY

# 1. WARC -> documents-shaped parquet (status filter, charset decode,
#    HTML main-text extraction, fused).
minerva-spark crawl warc-to-text --input "$OUT/warc" \
  --output "$OUT/docs_from_warc"

# 2. Frontier construction: sitemap explode -> URL profile ->
#    robots politeness -> incremental seen-URL state (two polls:
#    sitemap URLs, then the feed's new entry).
minerva-spark crawl sitemap-urls --input "$OUT/sitemaps" \
  --output "$OUT/candidates"
minerva-spark crawl url-profile --input "$OUT/candidates" \
  --url-col loc --output "$OUT/url_parts"
minerva-spark crawl robots-filter --input "$OUT/url_parts" \
  --robots "$OUT/robots" --url-col loc --output "$OUT/allowed"
minerva-spark crawl frontier-ingest --input "$OUT/allowed" \
  --url-col loc --state "$OUT/frontier_state" \
  --output "$OUT/poll1_decisions"
minerva-spark crawl feed-entries --input "$OUT/feeds" \
  --output "$OUT/feed_urls"
minerva-spark crawl frontier-ingest --input "$OUT/feed_urls" \
  --url-col link --state "$OUT/frontier_state" \
  --output "$OUT/poll2_decisions"
minerva-spark crawl robots-sitemaps --input "$OUT/robots" \
  --output "$OUT/discovered_sitemaps"

# 3. Document delivery: archives of PDFs -> text.  (media verbs read
#    (media_id, payload); the projection maps member rows onto that.)
minerva-spark archive read --input "$OUT/archives" \
  --output "$OUT/members"
python - "$OUT" <<'PY'
import sys

from minerva_etl_spark.session import get_spark
from pyspark.sql import functions as F

out = sys.argv[1]
spark = get_spark(app_name="crawl_demo_project")
spark.read.parquet(f"{out}/members").select(
    F.monotonically_increasing_id().alias("media_id"),
    F.col("content").alias("payload"),
).write.mode("overwrite").parquet(f"{out}/members_media")
PY
minerva-spark media pdf-text --input "$OUT/members_media" \
  --output "$OUT/pdf_texts" --on-error skip

echo "crawl demo complete: $OUT"
