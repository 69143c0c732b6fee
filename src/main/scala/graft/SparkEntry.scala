package graft

import graft.queries.{ImageQueries => IQ, RelationalQueries => RQ, TextEmbedQueries => TQ}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — SURVEY.md §7. `queries` exposes each operator from the
  * §2 inventory: pipeline-shaped operators over the TPC-H-ish testdata with
  * DuckDB oracles, text/dedup/ANN operators over documents/embeddings, and
  * the image pipeline itself over the synthesized corpus (rows-only — the
  * reference-semantics oracle for those lives in PipelineSpec). */
object SparkEntry {
  /** Flagship: the full image dedup pipeline on a synthesized corpus —
    * signatures → LSH band join → Hamming verify → CC → groups. */
  def entry(spark: SparkSession): DataFrame =
    IQ.qImgGroups(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // pipeline-shaped operators (DuckDB-gated)
    "q_hamming_hist" -> (RQ.qHammingHist _),
    "q_band_extract" -> (RQ.qBandExtract _),
    "q_band_join_pairs" -> (RQ.qBandJoinPairs _),
    "q_connected_components" -> (RQ.qConnectedComponents _),
    "q_dup_groups" -> (RQ.qDupGroups _),
    "q_group_status" -> (RQ.qGroupStatus _),
    "q_low_conf_gate" -> (RQ.qLowConfGate _),
    "q_prune_anti_join" -> (RQ.qPruneAntiJoin _),
    "q_cache_join" -> (RQ.qCacheJoin _),
    "q_registry_reuse" -> (RQ.qRegistryReuse _),
    "q_registry_ignored" -> (RQ.qRegistryIgnored _),
    "q_hardlink_groups" -> (RQ.qHardlinkGroups _),
    "q_keep_list" -> (RQ.qKeepList _),
    "q_stem_merge" -> (RQ.qStemMerge _),
    "q_index_probe" -> (RQ.qIndexProbe _),
    "q_greedy_groups" -> (RQ.qGreedyGroups _),
    "q_window_dup_counts" -> (RQ.qWindowDupCounts _),
    "q_top_per_key" -> (RQ.qTopPerKey _),
    "q_group_order_rank" -> (RQ.qGroupOrderRank _),
    "q_set_ops" -> (RQ.qSetOps _),
    "q_search_predicates" -> (RQ.qSearchPredicates _),
    "q_search_query_lang" -> (RQ.qSearchQueryLang _),
    "q_number_from_string" -> (RQ.qNumberFromString _),
    "q_exif_timestamp" -> (RQ.qExifTimestamp _),
    "q_dms_to_decimal" -> (RQ.qDmsToDecimal _),
    "q_natural_sort" -> (RQ.qNaturalSort _),
    "q_phash_groups" -> (RQ.qPhashGroups _),
    "q_group_max_dist" -> (RQ.qGroupMaxDist _),
    "q_band_join_r3" -> (RQ.qBandJoinR3 _),
    "q_exif_date_order" -> (RQ.qExifDateOrder _),
    // text / dedup / ANN operators (DuckDB-gated)
    "q_doc_shingles" -> (TQ.qDocShingles _),
    "q_doc_minhash" -> (TQ.qDocMinhash _),
    "q_minhash_band_pairs" -> (TQ.qMinhashBandPairs _),
    "q_simhash" -> (TQ.qSimhash _),
    "q_ngram_jaccard" -> (TQ.qNgramJaccard _),
    "q_token_stats" -> (TQ.qTokenStats _),
    "q_text_quality" -> (TQ.qTextQuality _),
    "q_lang_id" -> (TQ.qLangId _),
    "q_doc_fingerprint" -> (TQ.qDocFingerprint _),
    "q_exact_dedup_docs" -> (TQ.qExactDedupDocs _),
    "q_ann_topk" -> (TQ.qAnnTopK _),
    "q_ann_lsh_buckets" -> (TQ.qAnnLshBuckets _),
    "q_ann_ivf" -> (TQ.qAnnIvf _),
    "q_embed_near_dup" -> (TQ.qEmbedNearDup _),
    "q_substring_dup" -> (TQ.qSubstringDup _),
    "q_span_cuts" -> (TQ.qSpanCuts _),
    "q_span_apply" -> (TQ.qSpanApply _),
    "q_doc_dup_groups" -> (TQ.qDocDupGroups _),
    "q_suffix_ranks" -> (TQ.qSuffixRanks _),
    "q_suffix_dup_classes" -> (TQ.qSuffixDupClasses _),
    "q_suffix_lcp_pairs" -> (TQ.qSuffixLcpPairs _),
    // the image pipeline itself (rows-only; oracle = PipelineSpec)
    "q_img_signatures" -> (IQ.qImgSignatures _),
    "q_img_sig_meta" -> (IQ.qImgSigMeta _),
    "q_img_band_keys" -> (IQ.qImgBandKeys _),
    "q_img_edges" -> (IQ.qImgEdges _),
    "q_img_components" -> (IQ.qImgComponents _),
    "q_img_groups" -> (IQ.qImgGroups _),
    "q_img_dup_pairs" -> (IQ.qImgDupPairs _),
    "q_img_caption_candidates" -> (IQ.qImgCaptionCandidates _),
    "q_img_decode_meta" -> (IQ.qImgDecodeMeta _),
    "q_img_header_dims" -> (IQ.qImgHeaderDims _),
    "q_img_phash_groups" -> (IQ.qImgPhashGroups _),
    "q_img_exif" -> (IQ.qImgExif _),
    "q_img_enriched" -> (IQ.qImgEnriched _),
    "q_img_search" -> (IQ.qImgSearch _)
  )

  def oracleSql: Map[String, String] = {
    // the driver substitutes its own table paths? No — it runs this SQL
    // verbatim in DuckDB against the same sfDir; paths are embedded.
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    oracleSqlFor(d)
  }

  def oracleSqlFor(d: String): Map[String, String] = Map(
    "q_hamming_hist" -> RQ.sqlHammingHist(d),
    "q_band_extract" -> RQ.sqlBandExtract(d),
    "q_band_join_pairs" -> RQ.sqlBandJoinPairs(d),
    "q_connected_components" -> RQ.sqlConnectedComponents(d),
    "q_dup_groups" -> RQ.sqlDupGroups(d),
    "q_group_status" -> RQ.sqlGroupStatus(d),
    "q_low_conf_gate" -> RQ.sqlLowConfGate(d),
    "q_prune_anti_join" -> RQ.sqlPruneAntiJoin(d),
    "q_cache_join" -> RQ.sqlCacheJoin(d),
    "q_registry_reuse" -> RQ.sqlRegistryReuse(d),
    "q_registry_ignored" -> RQ.sqlRegistryIgnored(d),
    "q_hardlink_groups" -> RQ.sqlHardlinkGroups(d),
    "q_keep_list" -> RQ.sqlKeepList(d),
    "q_stem_merge" -> RQ.sqlStemMerge(d),
    "q_index_probe" -> RQ.sqlIndexProbe(d),
    "q_greedy_groups" -> RQ.sqlGreedyGroups(d),
    "q_window_dup_counts" -> RQ.sqlWindowDupCounts(d),
    "q_top_per_key" -> RQ.sqlTopPerKey(d),
    "q_group_order_rank" -> RQ.sqlGroupOrderRank(d),
    "q_set_ops" -> RQ.sqlSetOps(d),
    "q_search_predicates" -> RQ.sqlSearchPredicates(d),
    "q_search_query_lang" -> RQ.sqlSearchQueryLang(d),
    "q_number_from_string" -> RQ.sqlNumberFromString(d),
    "q_exif_timestamp" -> RQ.sqlExifTimestamp(d),
    "q_dms_to_decimal" -> RQ.sqlDmsToDecimal(d),
    "q_natural_sort" -> RQ.sqlNaturalSort(d),
    "q_phash_groups" -> RQ.sqlPhashGroups(d),
    "q_group_max_dist" -> RQ.sqlGroupMaxDist(d),
    "q_band_join_r3" -> RQ.sqlBandJoinR3(d),
    "q_exif_date_order" -> RQ.sqlExifDateOrder(d),
    "q_doc_shingles" -> TQ.sqlDocShingles(d),
    "q_doc_minhash" -> TQ.sqlDocMinhash(d),
    "q_minhash_band_pairs" -> TQ.sqlMinhashBandPairs(d),
    "q_simhash" -> TQ.sqlSimhash(d),
    "q_ngram_jaccard" -> TQ.sqlNgramJaccard(d),
    "q_token_stats" -> TQ.sqlTokenStats(d),
    "q_text_quality" -> TQ.sqlTextQuality(d),
    "q_lang_id" -> TQ.sqlLangId(d),
    "q_doc_fingerprint" -> TQ.sqlDocFingerprint(d),
    "q_exact_dedup_docs" -> TQ.sqlExactDedupDocs(d),
    "q_ann_topk" -> TQ.sqlAnnTopK(d),
    "q_ann_lsh_buckets" -> TQ.sqlAnnLshBuckets(d),
    "q_ann_ivf" -> TQ.sqlAnnIvf(d),
    "q_embed_near_dup" -> TQ.sqlEmbedNearDup(d),
    "q_substring_dup" -> TQ.sqlSubstringDup(d),
    "q_span_cuts" -> TQ.sqlSpanCuts(d),
    "q_span_apply" -> TQ.sqlSpanApply(d),
    "q_doc_dup_groups" -> TQ.sqlDocDupGroups(d),
    "q_suffix_ranks" -> TQ.sqlSuffixRanks(d),
    "q_suffix_dup_classes" -> TQ.sqlSuffixDupClasses(d),
    "q_suffix_lcp_pairs" -> TQ.sqlSuffixLcpPairs(d),
    // the REAL image pipeline's post-kernel stages, re-derived in DuckDB
    // from the exported kernel tables (brute-force + recursive-CTE
    // independent algorithms — see ImageQueries oracle section)
    "q_img_band_keys" -> IQ.sqlImgBandKeys(d),
    "q_img_edges" -> IQ.sqlImgEdges(d),
    "q_img_components" -> IQ.sqlImgComponents(d),
    "q_img_groups" -> IQ.sqlImgGroups(d),
    "q_img_dup_pairs" -> IQ.sqlImgDupPairs(d),
    "q_img_phash_groups" -> IQ.sqlImgPhashGroups(d),
    "q_img_caption_candidates" -> IQ.sqlImgCaptionCandidates(d),
    "q_img_decode_meta" -> IQ.sqlImgDecodeMeta(d),
    "q_img_header_dims" -> IQ.sqlImgHeaderDims(d),
    // decode-independent kernel slice: content classes straight off the
    // raw blob column (group-by bytes — no hash recomputation needed)
    "q_img_sig_meta" -> IQ.sqlImgSigMeta(d),
    "q_img_exif" -> IQ.sqlImgExif(d),
    "q_img_enriched" -> IQ.sqlImgEnriched(d),
    // search predicates re-evaluated over the exported enriched frame
    "q_img_search" -> IQ.sqlImgSearch(d)
  )
}
