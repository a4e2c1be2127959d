package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.{BloomMightContainLong, CharShingleHashes, CharTrigrams, CmsBucket, DupNgramCoverage, TopNgramStats, ChunkMd5s, ColumnShim, CosineSimilarity, DeflateRatio, Hash64, HyperplaneSignature, MinHashSignature, MultiprobeSignatures, NearestCentroids, PcaProject, PqCosine, PqCosineResidual, PqEncode, PqEncodeResidual, ShingleHashes, SimHash64, TokenDropout, TokenNgrams, TokenShingleHashes, WinnowMd5Fingerprints}

/** Column-API facade over graft's native expressions — use like
  * `org.apache.spark.sql.functions`:
  *
  * {{{
  *   import graft.functions.gf
  *   embeddings.select(gf.cosineSim(col("embedding"), gf.lit64(q)))
  * }}}
  */
object gf {
  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnShim.column(e)
  private def e(col: Column) = ColumnShim.expression(col)

  /** Cosine similarity of two `array<float>` columns (double). */
  def cosineSim(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))

  /** Codegen'd Bloom membership probe of a long column against a
    * pre-built sketch (no per-row UDF ser/de). */
  def bloomMightContain(key: Column,
                        bf: org.apache.spark.util.sketch.BloomFilter): Column =
    c(BloomMightContainLong(e(key), bf))

  /** 64-bit FNV-1a fingerprint of a string column. */
  def hash64(s: Column): Column = c(Hash64(e(s)))

  /** Count-Min multiply-shift bucket of a long column: top
    * `64 − shift` bits of `a·h + b mod 2⁶⁴` (wraparound). */
  def cmsBucket(h: Column, a: Long, b: Long, shift: Int): Column =
    c(CmsBucket(e(h), a, b, shift))

  /** Hashes of all k-token shingles of an `array<string>` column. */
  def shingleHashes(tokens: Column, k: Int): Column = c(ShingleHashes(e(tokens), k))

  /** Hashes of all character n-grams of a string column (rolling
    * hash, O(len)). */
  def charShingleHashes(text: Column, n: Int): Column = c(CharShingleHashes(e(text), n))

  /** All consecutive 3-char windows of a string (codegen'd). */
  def charTrigrams(text: Column): Column = c(CharTrigrams(e(text)))

  /** `[tok_chars, cov_minN..cov_maxN]` — fused duplicated-n-gram
    * char coverage (Gopher dup-gram mass), one codegen'd pass. */
  def dupNgramCoverage(toks: Column, minN: Int, maxN: Int): Column =
    c(DupNgramCoverage(e(toks), minN, maxN))

  /** `[maxc_minK, toplen_minK, …]` — fused top-n-gram argmax
    * (count + code-point length of the byte-order-smallest winner). */
  def topNgramStats(toks: Column, minK: Int, maxK: Int): Column =
    c(TopNgramStats(e(toks), minK, maxK))

  /** Fused canonicalize+tokenize+k-shingle of raw text — one byte
    * pass, no regexp (dedup fast path). */
  def tokenShingleHashes(text: Column, k: Int): Column = c(TokenShingleHashes(e(text), k))

  /** md5s of the non-overlapping n-token chunks of a text column
    * (fused, SQL-md5-parity — oracle-checkable). */
  def chunkMd5s(text: Column, n: Int): Column = c(ChunkMd5s(e(text), n))

  /** Winnowing fingerprints (distinct windowed-min gram md5s) of a
    * text column (fused, SQL-md5-parity — oracle-checkable). */
  def winnowFingerprints(text: Column, n: Int, window: Int): Column =
    c(WinnowMd5Fingerprints(e(text), n, window))

  /** Distinct space-joined token n-grams of a text column (fused,
    * SQL-spelling parity — oracle-checkable). */
  def tokenNgrams(text: Column, n: Int): Column = c(TokenNgrams(e(text), n))

  /** Deterministic token dropout at `rate` keyed on (doc, position,
    * salt) — fused tokenize+hash+filter+rejoin, value-identical to
    * the indexed-lambda SQL spelling (oracle-checkable). Output
    * whitespace is canonicalized to single spaces by construction.
    */
  def tokenDropout(text: Column, docId: Column, rate: Double,
                   salt: String): Column = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    val thr =
      if (rate >= 1.0) "g"
      else f"${math.floor(rate * 4294967296.0).toLong}%08x"
    c(TokenDropout(e(text), e(docId), thr, salt))
  }

  /** 64-bit SimHash of an `array<string>` token column. */
  def simhash64(tokens: Column): Column = c(SimHash64(e(tokens)))

  /** MinHash signature (`numPerms` longs) of a shingle-hash column. */
  def minhashSignature(hashes: Column, numPerms: Int, seed: Long): Column =
    c(MinHashSignature(e(hashes), numPerms, seed))

  /** Random-hyperplane LSH signature (long) of an `array<float>` column. */
  def hyperplaneSig(vec: Column, planes: Array[Array[Float]]): Column =
    c(HyperplaneSignature(e(vec), planes))

  /** Margin-ordered multiprobe LSH bucket list (`array<long>`) of an
    * `array<float>` column: exact signature + probes−1 single-bit
    * flips by ascending plane margin. */
  def multiprobeSigs(vec: Column, planes: Array[Array[Float]],
                     probes: Int): Column =
    c(MultiprobeSignatures(e(vec), planes, probes))

  /** PQ codes of a vector under per-subspace codebooks. */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Float]]]): Column =
    c(PqEncode(e(vec), codebooks))

  /** Approximate cosine between a query vector and PQ codes. */
  def pqCosine(q: Column, codes: Column, codebooks: Array[Array[Array[Float]]]): Column =
    c(PqCosine(e(q), e(codes), codebooks))

  /** IVF-PQ residual codes: PQ-encode `vec − centroids(cell)`. */
  def pqEncodeResidual(vec: Column, cell: Column,
                       centroids: Array[Array[Float]],
                       codebooks: Array[Array[Array[Float]]]): Column =
    c(PqEncodeResidual(e(vec), e(cell), centroids, codebooks))

  /** Approximate cosine against `centroids(cell) + residual(codes)`. */
  def pqCosineResidual(q: Column, codes: Column, cell: Column,
                       centroids: Array[Array[Float]],
                       codebooks: Array[Array[Array[Float]]]): Column =
    c(PqCosineResidual(e(q), e(codes), e(cell), centroids, codebooks))

  /** Probe list of the `nprobe` nearest centroids for an
    * `array<float>` column. */
  def nearestCentroids(vec: Column, centroids: Array[Array[Float]], nprobe: Int): Column =
    c(NearestCentroids(e(vec), centroids, nprobe))

  /** Deflate compression ratio (compressed ÷ raw bytes) of a string
    * column — the low-entropy/template-text signal. */
  def deflateRatio(s: Column): Column = c(DeflateRatio(e(s)))

  /** PCA projection (mean-center then multiply by the component
    * matrix) of an `array<float>` column. */
  def pcaProject(vec: Column, mean: Array[Float],
                 components: Array[Array[Float]]): Column =
    c(PcaProject(e(vec), mean, components))

  /** Deterministic pseudo-random unit hyperplanes (seeded). */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes) {
      val v = Array.fill(dim)((rnd.nextGaussian()).toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      if (n == 0f) v else v.map(_ / n)
    }
  }
}
