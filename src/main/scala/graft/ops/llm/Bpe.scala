package graft.ops.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016; the GPT-2
  * byte-level variant's published algorithm, here over character
  * symbols — the corpus is ASCII): a word starts as its character
  * symbols and the lowest-ranked adjacent pair merges repeatedly until
  * no adjacent pair appears in the merge table. Token BUDGETS are what
  * the chunk/pack/mix family sizes context windows by; whitespace
  * tokens (the oracled default there) under-count real tokenizer
  * tokens, so this module supplies the tokenizer-accurate mode.
  *
  * Scale shape: encoding is a per-row loop over a BROADCAST rank map —
  * a map-only stage, no shuffle, no driver involvement. It is a Scala
  * UDF deliberately: the merge loop is iterative per word (no builtin
  * expresses it), and a codegen Expression would have to emit the same
  * loop into generated Java for zero plan-shape benefit — the UDF cost
  * here is the loop itself, not the row boundary.
  *
  * Learning is the standard two-phase split: the pair-count/merge loop
  * runs driver-side over the WORD-FREQUENCY table (vocabulary-sized,
  * like the k×dim IVF codebook — capped and flagged, never
  * occurrence-sized), with the corpus touched exactly once for the
  * distributed word count. This is how production tokenizer trainers
  * work (word-count dict first), not a shortcut. */
object Bpe {

  /** Merge table learned from sf0.01 `documents` (lower, 120-char
    * prefix, whitespace words) by [[learn]]'s exact algorithm — the
    * deterministic fixture vocab for the oracled key; BpeSpec
    * re-derives it from the corpus so it cannot go stale. Valid by
    * construction: a pair containing a merged symbol always ranks
    * AFTER the merge that created the symbol, which is what makes
    * all-at-once and stepwise encoding agree (see [[encodeStepwise]]). */
  val FixtureMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("o", "w"), ("s", "t"), ("o", "r"), ("i", "n"),
    ("a", "t"), ("m", "er"), ("a", "l"), ("p", "a"), ("pa", "r"),
    ("h", "a"), ("ha", "s"), ("has", "h"), ("s", "m"), ("k", "e"),
    ("or", "d"), ("sm", "al"), ("par", "t"), ("r", "ow"), ("smal", "l"),
    ("ke", "y"), ("mer", "g"), ("merg", "e"), ("ord", "er"), ("j", "o"),
    ("b", "at"), ("c", "o"), ("c", "u"), ("d", "at"), ("r", "o"),
    ("t", "a"), ("dat", "a"), ("u", "p"), ("bat", "c"), ("co", "l"),
    ("cu", "st"), ("cust", "o"), ("g", "ro"), ("jo", "in"), ("gro", "up"),
    ("a", "g"), ("col", "u"), ("ta", "b"), ("s", "l"), ("tab", "l"),
    ("ag", "g"), ("custo", "mer"), ("st", "r"))

  def ranksOf(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** Greedy encode, all-occurrences-per-step (the published GPT-2
    * form): find the lowest-ranked adjacent pair present, merge every
    * occurrence left-to-right non-overlapping, repeat. */
  def encode(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var syms: Vector[String] = word.map(_.toString).toVector
    while (true) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) return syms
      val out = Vector.newBuilder[String]
      var j = 0
      while (j < syms.length) {
        if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
          out += best._1 + best._2; j += 2
        } else { out += syms(j); j += 1 }
      }
      syms = out.result()
    }
    syms
  }

  /** One-merge-per-step variant (lowest rank, leftmost occurrence) —
    * the form a SQL recursive CTE expresses, and therefore the form
    * the DuckDB oracle runs. For a merge table produced by BPE
    * training this is provably identical to [[encode]]: a pair
    * involving a merged symbol always ranks after the merge that
    * created the symbol, so merging one occurrence at a time never
    * changes which pair is globally minimal until all its occurrences
    * are gone. BpeSpec asserts the equivalence over the whole corpus. */
  def encodeStepwise(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector
    while (true) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestI = i } // strict <: leftmost wins ties
        i += 1
      }
      if (bestI < 0) return syms
      syms = (syms.take(bestI) :+ (syms(bestI) + syms(bestI + 1))) ++
        syms.drop(bestI + 2)
    }
    syms
  }

  /** Whitespace-pretokenize then BPE-encode each word; tokens flatten
    * in word order (no end-of-word marker — deterministic and
    * cross-engine expressible without one). */
  def tokenize(text: String, ranks: Map[(String, String), Int]): Seq[String] =
    if (text == null) Seq.empty
    else text.split(' ').toSeq.filter(_.nonEmpty).flatMap(encode(_, ranks))

  // one broadcast per (session, merge table), not per call — repeated
  // tokensCol/countCol invocations (bench reps, chunk/pack tokenizer
  // mode) reuse the handle instead of accumulating undestroyed
  // broadcast blocks; keyed by session so a restarted session rebuilds
  private val bcCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, Seq[(String, String)]),
    org.apache.spark.broadcast.Broadcast[Map[(String, String), Int]]]()
  private def ranksBc(spark: SparkSession, merges: Seq[(String, String)]) =
    bcCache.computeIfAbsent((spark, merges),
      _ => spark.sparkContext.broadcast(ranksOf(merges)))

  /** Column of BPE tokens (array<string>) for `text`, encoding against
    * a rank map broadcast once per (session, merge table) — the hot
    * path ships task closures a broadcast handle, not the table. */
  def tokensCol(spark: SparkSession, merges: Seq[(String, String)])
      : Column => Column = {
    val bc = ranksBc(spark, merges)
    val enc = udf { text: String => tokenize(text, bc.value) }
    text => enc(text)
  }

  /** Token-count twin of [[tokensCol]] for budget-only consumers
    * (pack/mix) — same encode, no token materialization. */
  def countCol(spark: SparkSession, merges: Seq[(String, String)])
      : Column => Column = {
    val bc = ranksBc(spark, merges)
    val cnt = udf { text: String => tokenize(text, bc.value).size.toLong }
    text => cnt(text)
  }

  /** Learn `numMerges` merges from a corpus column: ONE distributed
    * pass builds the word-frequency table, then the iterative
    * pair-count/merge loop runs driver-side over it (vocabulary-sized
    * state, the codebook precedent). `maxWords` caps driver memory —
    * overflow keeps the most frequent words (ties by word) and is the
    * standard trainer behavior, not silent truncation: the returned
    * table is exact for the retained vocabulary.
    *
    * Tie-breaks are total: max pair count, then lexicographically
    * smallest pair — same corpus in, same merges out, any partitioning. */
  def learn(docs: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 65536): Seq[(String, String)] = {
    val counts = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
    var vocab: Map[Vector[String], Long] =
      counts.groupBy { case (w, _) => w.map(_.toString).toVector }
        .map { case (syms, ws) => syms -> ws.map(_._2).sum }
    val merges = Seq.newBuilder[(String, String)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairs(p) = pairs.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val best = pairs.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.toSeq.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += best._1 + best._2; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), c)
        }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
        step += 1
      }
    }
    merges.result()
  }

  /** Tokenizer-accurate token stream per doc over the fixture vocab:
    * per doc, the BPE token count and an md5 over the space-joined
    * tokens — the fingerprint proves TOKEN-FOR-TOKEN parity with the
    * oracle's recursive-CTE encoder (merge order, leftmost ties,
    * multi-char symbols), not just counts. Map-only until the
    * presentation orderBy; the rank map rides a broadcast. */
  def qLlmBpe(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokensCol(spark, FixtureMerges)
    Tables.table(spark, dir, "documents")
      .select(col("doc_id"),
        toks(lower(substring(col("text"), 1, 120))).as("toks"))
      // domain = docs with at least one word in the 120-char prefix:
      // the oracle's inner join-back drops wordless docs, so a NULL/
      // blank-prefix doc must not emit an n_tokens=0 row here either
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("toks"))).as("toks_md5"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_bpe" -> (qLlmBpe _)
  )

  /** DuckDB runs the ONE-MERGE-PER-STEP recursive-CTE form over the
    * DISTINCT words (vocabulary-sized recursion, occurrence-sized only
    * at the join-back); Spark runs the all-occurrences greedy loop per
    * occurrence. The hash match proves the two encoding strategies
    * agree over the whole corpus — the merge-table validity argument
    * made executable. */
  val oracle: Map[String, String] = {
    val mapKeys = FixtureMerges.map { case (a, b) => s"'$a|$b'" }
      .mkString("[", ", ", "]")
    val mapVals = FixtureMerges.indices.mkString("[", ", ", "]")
    Map(
      "q_llm_bpe" ->
        s"""WITH RECURSIVE
           |occur AS (
           |  SELECT doc_id, wi, w
           |  FROM (SELECT doc_id,
           |          unnest(string_split(lower(substr(text,1,120)), ' ')) AS w,
           |          unnest(range(len(string_split(lower(substr(text,1,120)), ' ')))) AS wi
           |        FROM documents)
           |  WHERE w <> ''),
           |words AS (SELECT DISTINCT w FROM occur),
           |enc(w, syms, step) AS (
           |  SELECT w, string_split_regex(w, ''), 0 FROM words
           |  UNION ALL
           |  SELECT w,
           |    syms[1:best.i-1] || [syms[best.i] || syms[best.i+1]] || syms[best.i+2:],
           |    step + 1
           |  FROM (
           |    SELECT w, syms, step,
           |      list_aggregate(list_filter(list_transform(range(1, len(syms)), i ->
           |        {'r': element_at(MAP($mapKeys, $mapVals),
           |                         syms[i] || '|' || syms[i+1])[1], 'i': i}),
           |        x -> x.r IS NOT NULL), 'min') AS best
           |    FROM enc) s
           |  WHERE best IS NOT NULL),
           |encoded AS (
           |  SELECT w, syms FROM (
           |    SELECT w, syms,
           |      row_number() OVER (PARTITION BY w ORDER BY step DESC) rn
           |    FROM enc) WHERE rn = 1),
           |joined AS (
           |  SELECT o.doc_id,
           |    string_agg(t.tok, ' ' ORDER BY o.wi, t.si) AS alltoks,
           |    count(*)::BIGINT AS n_tokens
           |  FROM occur o JOIN
           |    (SELECT w, unnest(syms) AS tok, unnest(range(len(syms))) AS si
           |     FROM encoded) t
           |    ON o.w = t.w
           |  GROUP BY o.doc_id)
           |SELECT doc_id, n_tokens, md5(alltoks) AS toks_md5
           |FROM joined ORDER BY doc_id""".stripMargin
    )
  }
}
