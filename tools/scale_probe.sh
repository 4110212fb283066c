#!/bin/bash
# Scale probe (VERDICT r5 "Next round" #4): measure the heavy-tail
# operators at sf0.1 and at the ScaleGen-derived 10x dataset (sf1), same
# harness (Bench --child: fresh JVM per group, warm-up + median of 3,
# noop-sink materialization), then analyze with scale_probe.py.
#
# m03_media_neardup is deliberately ABSENT: it is the documented
# quadratic verify tier (VERDICT r5 plan audit) — at 10x its per-format
# pair set grows ~100x by design; m04 (the auto-tiered scale path) is
# what must stay sub-quadratic and IS probed.
#
# Usage: tools/scale_probe.sh [sf1dir]   (default /tmp/graft-sf1)
set -e
cd /root/repo
SF1=${1:-/tmp/graft-sf1}
G1="d01_exact_dedup,d02_minhash_dedup,d04_ngram_jaccard,d05_embedding_neardup,t01_token_counts"
G2="d10_transitive_clusters,d12_minhash_quality,d14_dedup_pipeline,d16_substring_dedup,x04_cluster_histogram"
G3="t08_contamination,g01_host_pagerank,g04_hits,x03_split_leakage,m04_media_neardup_lsh"
G4="e01_cosine_topk,e16_pca_power,e19_lloyd_trace,p13_epoch_plan,d08_chunk_dedup,d09_intradoc_dedup"
G5="t25_perplexity_buckets,x08_threshold_sweep,e20_nprobe_sweep,g05_communities"
# G6 (r13): the compressed ANN serving tier at 10x — e23 one-stage ADC,
# e26 two-stage refine (the pq-search?raw= route's plan: kCoarse ADC
# candidates, then raw vectors for |queries|*kCoarse rows only), e25 the
# recall side of the same kCoarse trade — plus the r13 stored-artifact
# closers (appended layout probe, model append+fold, 10-family audit)
G6="e23_indexed_ivfpq,e26_pq_rerank,e25_pq_recall,p18_zorder_append,p19_zorder_repair,t34_model_append,x13_release_audit"

if [ ! -f "$SF1/documents.parquet/_SUCCESS" ]; then
  echo "== generating $SF1 (10x sf0.1) =="
  sbt -batch "runMain graft.ScaleGen /root/testdata/sf0.1 $SF1 10" 2>&1 | grep GRAFT_SCALEGEN
fi

for sf in /root/testdata/sf0.1 "$SF1"; do
  tag=$(basename "$sf" | tr -cd 'a-z0-9.')
  out=/tmp/probe_${tag}.txt
  : > "$out"
  for g in "$G1" "$G2" "$G3" "$G4" "$G5" "$G6"; do
    echo "== $tag  $g =="
    SPARK_GRAFT_SF_DIR=$sf sbt -batch "runMain graft.Bench --child $g" 2>/dev/null \
      | grep GRAFT_TIME | tee -a "$out"
  done
done
python3 tools/scale_probe.py /tmp/probe_sf0.1.txt "/tmp/probe_$(basename "$SF1" | tr -cd 'a-z0-9.').txt"
