package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind graft's native Catalyst expressions. Static
  * forwarders (standalone Scala objects) make these callable from
  * whole-stage-codegen'd Java, so the expressions stay inside the
  * codegen pipeline instead of falling back to interpreted eval.
  *
  * All hashing is FNV-1a-64 / splitmix64 — public, seedable, and
  * engine-deterministic (the LSH/minhash family is checked by
  * ScalaTest specs, not SQL oracles, so cross-engine hash parity is
  * not required; cross-partition determinism is).
  */
object VectorOps {

  /** Cosine similarity of two float vectors, accumulated in double.
    * Returns 0.0 when either norm is 0 (convention: nothing is
    * similar to the zero vector).
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  /** Random-hyperplane LSH signature: bit i is the sign of
    * `v · planes(i)`. Up to 64 planes → one long.
    */
  def hyperplaneSig(v: ArrayData, planes: Array[Array[Float]]): Long = {
    var bits = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(v.numElements(), plane.length)
      var s = 0.0; var i = 0
      while (i < n) { s += v.getFloat(i).toDouble * plane(i); i += 1 }
      if (s > 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  /** IVF probe list: indices of the `nprobe` centroids nearest (by
    * cosine) to `v`, most similar first, ties broken by index.
    */
  def nearestCentroids(v: ArrayData, centroids: Array[Array[Float]], nprobe: Int): ArrayData = {
    val sims = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = math.min(v.numElements(), cent.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = v.getFloat(i).toDouble; val y = cent(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      sims(c) = if (na == 0.0 || nb == 0.0) -2.0 else dot / (math.sqrt(na) * math.sqrt(nb))
      c += 1
    }
    val order = (0 until centroids.length).sortBy(i => (-sims(i), i)).take(nprobe)
    new GenericArrayData(order.map(_.asInstanceOf[Any]).toArray)
  }

  /** Product-quantization encode: for each subspace j (contiguous
    * slice of the vector), the index of the L2-nearest codebook
    * entry. `codebooks(j)` is the k×subDim codebook of subspace j.
    */
  def pqEncode(v: ArrayData, codebooks: Array[Array[Array[Float]]]): ArrayData = {
    val m = codebooks.length
    var dims = 0
    locally { var j = 0; while (j < m) { dims += codebooks(j)(0).length; j += 1 } }
    // fail fast on a mixed-dim corpus — zero-padding here would
    // silently produce wrong neighbors (codebooksFromSample only
    // checks the sampled vectors)
    require(v.numElements() == dims,
      s"pq_encode: vector has ${v.numElements()} dims, codebooks cover $dims")
    val out = new Array[Any](m)
    var j = 0; var off = 0
    while (j < m) {
      val cb = codebooks(j)
      val sub = cb(0).length
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d = 0.0; var i = 0
        while (i < sub) {
          val diff = v.getFloat(off + i).toDouble - cent(i)
          d += diff * diff; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best
      off += sub; j += 1
    }
    new GenericArrayData(out)
  }

  /** Approximate cosine of a full query vector against a
    * PQ-reconstructed corpus vector, reading only the m code bytes —
    * the corpus's float payload never enters the scan.
    */
  def pqCosine(q: ArrayData, codes: ArrayData,
               codebooks: Array[Array[Array[Float]]]): Double = {
    var dims = 0
    locally { var j = 0; while (j < codebooks.length) { dims += codebooks(j)(0).length; j += 1 } }
    require(q.numElements() == dims,
      s"pq_cosine: query has ${q.numElements()} dims, codebooks cover $dims")
    var dot = 0.0; var nq = 0.0; var nx = 0.0
    var j = 0; var off = 0
    while (j < codebooks.length) {
      val cent = codebooks(j)(codes.getInt(j))
      var i = 0
      while (i < cent.length) {
        val qv = q.getFloat(off + i).toDouble
        val xv = cent(i).toDouble
        dot += qv * xv; nq += qv * qv; nx += xv * xv
        i += 1
      }
      off += cent.length; j += 1
    }
    if (nq == 0.0 || nx == 0.0) -2.0 else dot / (math.sqrt(nq) * math.sqrt(nx))
  }
}

object TextChars {

  /** All consecutive 3-char windows of a string (char-indexed, so
    * multibyte-safe and identical to SQL substr semantics). One byte
    * pass recording char-start offsets, then O(1) slices — both
    * `UTF8String.substring(i, j)` per window (O(len) seek each) and
    * the `transform(sequence(...))` HOF spelling (interpreted per
    * element) are quadratic by comparison.
    */
  def charTrigrams(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](n + 1)
    var count = 0
    var i = 0
    while (i < n) {
      starts(count) = i
      count += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    starts(count) = n
    if (count < 3) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count - 2)
    var c = 0
    while (c < count - 2) {
      out(c) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, starts(c), starts(c + 3)))
      c += 1
    }
    new GenericArrayData(out)
  }
}

object TextHashes {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime  = 0x100000001b3L

  /** FNV-1a-64 over UTF-8 bytes. */
  def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
    h
  }

  private def mix(h0: Long, s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = h0
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
    // token separator (a byte that can't appear inside UTF-8 text)
    h ^= 0xffL; h *= FnvPrime
    h
  }

  /** Hashes of all `k`-token shingles of a token array: element i is
    * the FNV-1a hash of tokens[i..i+k) with separators. Empty result
    * when the document has fewer than k tokens.
    */
  def shingleHashes(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      var h = FnvOffset
      var j = 0
      while (j < k) { h = mix(h, tokens.getUTF8String(i + j)); j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over a token array: bit i of the result is set
    * when the majority of token hashes have bit i set.
    */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val h = hash64(tokens.getUTF8String(t))
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      t += 1
    }
    var bits = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) bits |= (1L << i); i += 1 }
    bits
  }

  /** Hashes of all character n-grams of a string, via a rolling
    * polynomial hash over the UTF-8 bytes — O(len) total, no
    * per-character array materialization (`split(text, "")` allocates
    * one UTF8String per char; this allocates nothing but the output).
    */
  def charShingleHashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    if (bytes.length < n) return new GenericArrayData(Array.empty[Any])
    val B = FnvPrime
    // B^n (wrapping)
    var bn = 1L
    var i = 0
    while (i < n) { bn *= B; i += 1 }
    val out = new Array[Any](bytes.length - n + 1)
    var h = 0L
    i = 0
    while (i < n) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    out(0) = h
    i = n
    while (i < bytes.length) {
      h = h * B + (bytes(i) & 0xffL) - (bytes(i - n) & 0xffL) * bn
      out(i - n + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Fused canonicalize→tokenize→k-shingle in ONE pass over the
    * UTF-8 bytes: ASCII-lowercases on the fly, treats whitespace runs
    * as token boundaries, maintains a ring of the last k token hashes
    * and emits the combined shingle hash at each token end. No
    * regexp, no intermediate token array — the fast path for
    * dedup pipelines (the general ops keep the regexp-based
    * tokenizer for engine-parity with SQL oracles).
    */
  def tokenShingleHashesFused(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val ring = new Array[Long](k)
    val out = new java.util.ArrayList[Any]()
    var nTokens = 0
    var h = FnvOffset
    var inToken = false

    def endToken(): Unit = if (inToken) {
      ring(nTokens % k) = h
      nTokens += 1
      if (nTokens >= k) {
        // combine the last k token hashes, oldest first
        var sh = FnvOffset
        var j = 0
        while (j < k) {
          val th = ring((nTokens - k + j) % k)
          sh ^= (th & 0xffL); sh *= FnvPrime
          sh ^= ((th >>> 32) & 0xffffffffL); sh *= FnvPrime
          j += 1
        }
        out.add(sh)
      }
      h = FnvOffset
      inToken = false
    }

    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val isWs = b == ' ' || b == '\t' || b == '\n' || b == '\r' ||
        b == '\f' || b == 0x0b
      if (isWs) endToken()
      else {
        val lower = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
        h ^= (lower & 0xffL); h *= FnvPrime
        inToken = true
      }
      i += 1
    }
    endToken()
    new GenericArrayData(out.toArray)
  }

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** MinHash signature: for each of `numPerms` seeded universal-hash
    * permutations `h_p(x) = a_p*x + b_p`, the unsigned-min over the
    * input hashes. Empty input → MaxValue sentinel per perm (no
    * shingles can never collide with a real signature band).
    */
  def minhashSignature(hashes: ArrayData, numPerms: Int, seed: Long): ArrayData = {
    val out = new Array[Any](numPerms)
    val n = hashes.numElements()
    var p = 0
    while (p < numPerms) {
      val a = splitmix64(seed + 2L * p) | 1L
      val b = splitmix64(seed + 2L * p + 1L)
      var min = -1L // unsigned max
      var i = 0
      while (i < n) {
        val h = a * hashes.getLong(i) + b
        if (java.lang.Long.compareUnsigned(h, min) < 0) min = h
        i += 1
      }
      out(p) = min
      p += 1
    }
    new GenericArrayData(out)
  }
}
