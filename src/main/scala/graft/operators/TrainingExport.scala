package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The end-to-end corpus → training-sequences plan: every step of the
 * ingest-to-export chain composed into ONE declarative DataFrame, so
 * Catalyst sees (and pipelines) the whole thing:
 *
 *   quality/language gates  →  exact dedup (first doc per fingerprint)
 *   →  per-language rebalancing sample  →  deterministic shard layout
 *   →  token-budget sequence packing
 *
 * This is the reference's topology idea — a fetcher→op→op→sink chain
 * wired once and executed as a unit (stormcv `E1_FaceDetectionTopology
 * .java:66-90` builds the whole graph before submitting) — applied to
 * the LLM-corpus export job. Physical shape at 100 TB: the gates and
 * the fingerprint are single-pass codegen'd expressions evaluated in
 * the scan stage (rows die before anything is shuffled); dedup is one
 * hash exchange on the 16-byte fingerprint; the rebalance is a
 * broadcast-join + stateless filter (no shuffle); the shard/pack layout
 * is one hash exchange on `shard` + an in-partition sort. Two shuffles
 * total, both on bounded-width keys, and every intermediate column the
 * sink does not need is pruned before the first exchange.
 *
 * Determinism: gates, fingerprint, sample membership, shard id, and
 * in-shard order are all pure functions of the row (md5-derived), so
 * the exported (shard, pack, pos) layout is bit-identical across
 * reruns, partitionings, and engines — the property that lets a
 * 1000-loader training job resume mid-epoch by (shard, pack).
 */
object TrainingExport {

  /**
   * `docs` needs (doc_id, source, text); `rates` is the
   * `(stratum, keep_per_mille)` ratebook over PREDICTED language (a
   * stratum absent from the ratebook is dropped — explicit allowlist,
   * see [[Sampling.bernoulliByStratum]]). Returns one row per kept
   * document with `(doc_id, source, lang_pred, q, toks, shard, pos,
   * pack, pack_off)`.
   */
  def corpusToPacks(docs: DataFrame, rates: DataFrame, minQuality: Int,
      budget: Long, nShards: Int): DataFrame =
    corpusToPacks(docs, rates, minQuality, budget, nShards, None)

  /**
   * As above, with an optional TRANSITIVE near-dup dedup stage: given a
   * `(id, cluster_id)` labeling of the candidate-pair graph (from
   * [[Components.connectedComponents]] / [[Components.ccIncrement]] over
   * any [[Dedup]] pair finder), exactly one gated member of each cluster
   * survives into the export — the min-id GATED member, so a cluster
   * whose graph-min doc failed the quality gate still exports its best-id
   * surviving member rather than vanishing. Unclustered docs (the vast
   * majority — the pair graph is a sliver of the corpus) pass through on
   * an anti-join; only clustered docs pay the keeper row_number, so there
   * is no giant NULL-cluster partition to skew on.
   */
  def corpusToPacks(docs: DataFrame, rates: DataFrame, minQuality: Int,
      budget: Long, nShards: Int, nearDupLabels: Option[DataFrame]): DataFrame = {
    val gated = docs
      .select(col("doc_id"), col("source"),
        TextAnalysis.qualityScore(col("text")).as("q"),
        TextAnalysis.langId(col("text")).as("lang_pred"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        TextAnalysis.tokenCount(col("text")).as("toks"))
      .where(col("q") >= minQuality && col("lang_pred") =!= "und")
    // first-doc-per-fingerprint via row_number: the gate chain is
    // evaluated once, one shuffle on fp (the q45 lesson)
    val exactKept = gated
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .where(col("rn") === 1)
      .drop("rn", "fp")
    val keepers = nearDupLabels match {
      case None => exactKept
      case Some(labels) =>
        val lbl = labels.select(col("id").as("doc_id"), col("cluster_id"))
        val clustered = exactKept.join(lbl, Seq("doc_id"))
        val clusterKeepers = clustered
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("cluster_id")).orderBy(col("doc_id"))))
          .where(col("rn") === 1)
          .drop("rn", "cluster_id")
        exactKept.join(lbl.select(col("doc_id")), Seq("doc_id"), "left_anti")
          .unionByName(clusterKeepers)
    }
    val balanced =
      Sampling.bernoulliByStratum(keepers, "doc_id", "lang_pred", rates)
    Sampling.packByTokenBudget(balanced, "doc_id", "toks", budget, nShards)
  }

  /**
   * Materialize the ACTUAL training sequences from the
   * [[Sampling.packByTokenBudget]] layout — the step that turns the
   * (shard, pos, pack, pack_off) bookkeeping into `budget`-token rows a
   * loader memory-maps. Documents are laid out in deterministic (shard,
   * pos) order and the token stream is cut every `budget` tokens; a doc
   * straddling one or more pack boundaries is SPLIT token-exactly (its
   * head finishes pack p, its middle fills packs p+1.., its tail opens
   * the last one — no padding, GPT-style). Returns one row per (shard,
   * pack): `(shard, pack, seq_toks, seq_text)` with `seq_toks == budget`
   * for every pack except the final one of each shard, and `seq_text` =
   * the pack's tokens joined by single spaces (doc boundaries are also
   * single spaces; insert EOS markers upstream as ordinary tokens if the
   * tokenizer needs them).
   *
   * Tokenization is `regexp_extract_all(text, '\\S+')` — exactly the
   * token definition [[TextAnalysis.tokenCount]] counts, so the layout's
   * arithmetic and the materialized slices can never disagree.
   *
   * Physical shape at 100 TB: the layout is q64's (one hash exchange on
   * `shard` + in-partition sort); splitting is a row-local explode whose
   * fan-out is `1 + straddled boundaries` (≈ 1 + toks/budget, bounded);
   * sequence assembly is ONE groupBy on (shard, pack) whose input rows
   * already live in the right partitions when `nShards` aligns with the
   * shuffle partitioning. Nothing is ever keyed by the sequence text.
   */
  def packedSequences(docs: DataFrame, idCol: String, textCol: String,
      budget: Long, nShards: Int): DataFrame =
    packPieces(docs, idCol, textCol, budget, nShards)
      .groupBy(col("shard"), col("pack"))
      .agg(sum(col("piece_toks")).as("seq_toks"),
        sort_array(collect_list(struct(col("pos"), col("piece")))).as("__ps"))
      .select(col("shard"), col("pack"), col("seq_toks"),
        array_join(transform(col("__ps"), x => x.getField("piece")), " ")
          .as("seq_text"))

  /** The per-(shard, pack) doc PIECES behind [[packedSequences]] and
    * [[packBoundaries]]: one row per (doc, covered pack) with the piece
    * text, its token count, and where inside the pack it starts
    * (`piece_off` — the doc's `pack_off` for its head piece, 0 for
    * spill pieces; `is_head` marks the piece where the doc begins). */
  private def packPieces(docs: DataFrame, idCol: String, textCol: String,
      budget: Long, nShards: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val base = docs.select(col(idCol),
        regexp_extract_all(col(textCol), lit("\\S+"), lit(0)).as("__toks_arr"))
      .withColumn("__toks", size(col("__toks_arr")).cast("long"))
    val layout = Sampling.packByTokenBudget(base, idCol, "__toks", budget, nShards)
    layout
      .where(col("__toks") > 0) // zero-token docs hold their layout slot but emit nothing
      .withColumn("__rel", explode(sequence(lit(0L),
        expr(s"(pack_off + __toks - 1) div $budget"))))
      .select(col("shard"), (col("pack") + col("__rel")).as("pack"), col("pos"),
        (col("__rel") === 0L).as("is_head"),
        when(col("__rel") === 0L, col("pack_off")).otherwise(lit(0L))
          .as("piece_off"),
        greatest(lit(0L), col("__rel") * budget - col("pack_off")).as("__lo"),
        least(col("__toks"), (col("__rel") + 1) * budget - col("pack_off")).as("__hi"),
        col("__toks_arr"))
      .select(col("shard"), col("pack"), col("pos"), col("is_head"),
        col("piece_off"),
        (col("__hi") - col("__lo")).as("piece_toks"),
        array_join(slice(col("__toks_arr"), (col("__lo") + 1).cast("int"),
          (col("__hi") - col("__lo")).cast("int")), " ").as("piece"))
  }

  /**
   * Per-sequence DOCUMENT BOUNDARIES — the block-diagonal attention-mask
   * spec a loader pairs with [[packedSequences]]' token rows (packed
   * training forbids attention across document boundaries; without this
   * table the packs are unusable for masked packing). One row per
   * (shard, pack): `boundaries` = ascending in-pack token offsets where
   * a NEW document begins (comma-joined; "" for a pack fully covered by
   * one straddling giant), `n_docs` = documents beginning in the pack,
   * and `continuation` = whether the pack OPENS mid-document (true iff
   * no boundary sits at offset 0 — a doc's spilled tail/middle owns the
   * front of the pack). Spill-only middle packs of multi-pack giants
   * appear with `n_docs = 0, continuation = true`.
   *
   * Same physical shape as the sequence materialization it mirrors: the
   * q64 layout + a bounded row-local explode + ONE partial-aggregated
   * groupBy on (shard, pack) — boundaries are tiny integer lists, the
   * text is never touched (project [[packPieces]]' metadata only and
   * Spark prunes the token arrays out of the explode).
   */
  def packBoundaries(docs: DataFrame, idCol: String, textCol: String,
      budget: Long, nShards: Int): DataFrame =
    packPieces(docs, idCol, textCol, budget, nShards)
      .groupBy(col("shard"), col("pack"))
      .agg(
        sum(when(col("is_head"), 1L).otherwise(0L)).as("n_docs"),
        array_join(transform(sort_array(collect_list(
            when(col("is_head"), col("piece_off")))),
          v => v.cast(org.apache.spark.sql.types.StringType)), ",")
          .as("boundaries"))
      .withColumn("continuation",
        col("n_docs") === 0L || !col("boundaries").startsWith("0"))

  /**
   * Write materialized sequences as a loader-friendly `shard=NN/` layout:
   * one directory per shard (Hive partitioning — shard pruning is free on
   * read), rows sorted by `pack` within each shard's files so a loader
   * resuming at (shard, pack) seeks, not scans. One file per shard at
   * this writer's parallelism; the streaming path writes through
   * [[graft.streaming.ExactlyOnceSink]] with `bucket_col = shard`
   * instead (epochs + manifest), this is the one-shot batch form.
   *
   * Alongside the data it writes `_export.json` — the dataset card a
   * training loader checks before an epoch: per-shard pack and token
   * counts plus totals (the per-shard stats are a `nShards`-row
   * aggregate, the one driver-side fold an export manifest costs —
   * same shape as the sink's per-epoch manifest stats).
   */
  def writePackedSequences(seqs: DataFrame, dir: String): Unit = {
    seqs.repartition(col("shard"))
      .sortWithinPartitions(col("pack"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("shard").parquet(dir)
    // stats come from the parquet just WRITTEN, not from re-executing the
    // seqs plan (which would replay every upstream shuffle and the text
    // materialization a second time, and could diverge from the files if
    // an input mutated between the two executions)
    val per = seqs.sparkSession.read.parquet(dir)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("packs"), sum(col("seq_toks")).as("tokens"))
      .orderBy(col("shard"))
      .collect().map(r => (r.getAs[Number]("shard").longValue(),
        r.getLong(1), r.getLong(2)))
    val json =
      s"""{"shards":${per.length},"packs":${per.map(_._2).sum},""" +
      s""""tokens":${per.map(_._3).sum},"per_shard":[""" +
      per.map { case (s, p, t) =>
        s"""{"shard":$s,"packs":$p,"tokens":$t}""" }.mkString(",") + "]}"
    val conf = seqs.sparkSession.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir, "_export.json")
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /**
   * Per-epoch deterministic reshuffle of the pack order — training reads
   * a DIFFERENT pseudo-random permutation each epoch, but the data is
   * written once: the permutation is a pure function of (epoch, key), so
   * no epoch ever rewrites or re-shuffles the corpus. Returns the input
   * plus `ord` = 1-based rank of `(hash48(epoch + ":" + key), key)`
   * within the shard — every loader, rerun, and engine derives the same
   * epoch-e order, and resuming mid-epoch is a (shard, ord) seek.
   *
   * Physical shape: one hash exchange on `shard` + an in-partition sort
   * (the same exchange the shard layout already established — with the
   * corpus table bucketed by shard, the exchange is elided entirely and
   * the epoch order costs one sort of each shard's pack INDEX, never the
   * sequence bytes: keep `keyCol` projections narrow and join `ord` back
   * by key if the loader needs the text).
   */
  def epochOrder(packs: DataFrame, shardCol: String, keyCol: String,
      epoch: Long): DataFrame = {
    // fail fast on reserved names (the repo-wide internal-name guard
    // convention): withColumn would otherwise silently OVERWRITE a
    // pre-existing `ord` — e.g. chaining a second epoch's order without
    // renaming the first would clobber it, not error
    require(!packs.columns.contains("ord") && !packs.columns.contains("__ehu"),
      s"input already carries 'ord'/'__ehu' — rename the previous epoch's " +
      "order column before deriving another")
    val w = Window.partitionBy(col(shardCol)).orderBy(col("__ehu"), col(keyCol))
    packs
      .withColumn("__ehu", Sampling.hashUniform48(
        concat(lit(s"$epoch:"), col(keyCol).cast("string"))))
      .withColumn("ord", row_number().over(w).cast("long"))
      .drop("__ehu")
  }

  /**
   * Fill-in-the-middle transformation (PSM order) — the training-data
   * rewrite behind FIM-capable code/text models: each document is cut
   * at two DETERMINISTIC token positions `0 < i < j < n_toks` (both
   * md5-derived from the doc id, so the split is reproducible across
   * reruns, partitionings, and engines — the [[Sampling.hashUniform48]]
   * discipline) and re-serialized as
   * `<FIM_PRE>prefix<FIM_SUF>suffix<FIM_MID>middle`, which trains the
   * model to infill `middle` given both sides. Cuts guarantee all
   * three segments non-empty; documents under 3 tokens pass through
   * unchanged with `cut_i = cut_j = 0` (nothing to infill — dropping
   * them silently would break the one-row-per-doc contract).
   *
   * Returns `(idCol, n_toks, cut_i, cut_j, fim_text)`. Fully row-local
   * (one tokenize, two md5s, three slices — scan-stage, zero shuffle);
   * apply downstream of the gates and upstream of [[packedSequences]].
   */
  def fimSplit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = TextAnalysis.wordArray(col(textCol))
    val k = size(w)
    val hi = Sampling.hashUniform48(
      concat(col(idCol).cast("string"), lit(":i")))
    val hj = Sampling.hashUniform48(
      concat(col(idCol).cast("string"), lit(":j")))
    val i = (lit(1L) + hi % (k - 2).cast("long")).cast("int")
    val j = (i.cast("long") + lit(1L) +
      hj % (k.cast("long") - 1L - i.cast("long"))).cast("int")
    val fim = concat(lit("<FIM_PRE>"), array_join(slice(w, lit(1), i), " "),
      lit("<FIM_SUF>"), array_join(slice(w, j + 1, k - j), " "),
      lit("<FIM_MID>"), array_join(slice(w, i + 1, j - i), " "))
    docs.select(col(idCol), k.cast("long").as("n_toks"),
      when(k >= 3, i.cast("long")).otherwise(lit(0L)).as("cut_i"),
      when(k >= 3, j.cast("long")).otherwise(lit(0L)).as("cut_j"),
      when(k >= 3, fim).otherwise(col(textCol)).as("fim_text"))
  }
}
