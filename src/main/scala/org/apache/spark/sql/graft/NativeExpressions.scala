package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (with `doGenCode`) for per-pair hot loops.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`,
  * `array_intersect`) evaluate interpreted — measured ~50-70µs per call on
  * 64-140 element arrays, which multiplies catastrophically inside a
  * similarity join evaluating millions of pairs (SURVEY.md §4.2 "custom
  * Expression (codegen) if the HOF version is too slow"). These compile
  * into the whole-stage-codegen loop: a tight primitive-array walk with
  * zero allocation per row.
  *
  * Lives under `org.apache.spark.sql` because the expression SPI types
  * (`AbstractDataType`, `ExpressionUtils`) are `private[sql]`; the public
  * faces are the Column helpers below, `graft.functions.Vectors` /
  * `graft.functions.TextDedup`, and the SQL registrations in
  * `GraftFunctions`.
  *
  * Null semantics: standard `BinaryExpression` null-propagation (null
  * array → null result); null ELEMENTS are not expected (inputs are
  * generated arrays) and read as 0.0/0 per Spark's primitive accessors.
  */
object NativeExpressions {

  /** Sequential-fold dot product over two array<double> columns; same
    * left-to-right summation order as the HOF formulation and DuckDB's
    * `list_dot_product`, so results stay bit-identical to the oracle.
    * Null semantics are faithful to
    * `aggregate(zip_with(a,b,(x,y)->x*y), 0.0, +)` on ALL inputs:
    * unequal lengths (zip_with null-pads) or any null element → NULL —
    * required for NativeDotProductRewrite to be semantics-preserving. */
  case class DotProductDouble(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_dot"

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val a = left.eval(input)
      if (a == null) return null
      val b = right.eval(input)
      if (b == null) return null
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) return null
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |int $n = $a.numElements();
           |if ($b.numElements() != $n) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
           |      ${ev.isNull} = true; break;
           |    }
           |    $s += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |  if (!${ev.isNull}) { ${ev.value} = $s; }
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Intersection size of two ASCENDING-sorted int arrays via a linear
    * merge — no per-row hash set, no allocation. Caller guarantees sorted
    * distinct inputs (e.g. `array_sort(collect_list(...))` of distinct
    * keys); unsorted input silently undercounts. */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(IntegerType), ArrayType(IntegerType))
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_sorted_intersect_count"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val nx = x.numElements()
      val ny = y.numElements()
      var i = 0; var j = 0; var c = 0
      while (i < nx && j < ny) {
        val xv = x.getInt(i); val yv = y.getInt(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      c
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val ni = ctx.freshName("ni")
        val nj = ctx.freshName("nj")
        val c = ctx.freshName("c")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        s"""
           |int $i = 0, $j = 0, $c = 0;
           |int $ni = $a.numElements(), $nj = $b.numElements();
           |while ($i < $ni && $j < $nj) {
           |  int $xv = $a.getInt($i);
           |  int $yv = $b.getInt($j);
           |  if ($xv == $yv) { $c++; $i++; $j++; }
           |  else if ($xv < $yv) { $i++; } else { $j++; }
           |}
           |${ev.value} = $c;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** LongType sibling of [[SortedIntersectCount]]: intersection size of two
    * ASCENDING-sorted (signed order) long arrays via a linear merge. The
    * shingle-hash sets ([[SortedDistinctShingleHashes]]) are exactly this
    * shape, so pair verification in TextDedup compiles into the join's
    * codegen loop instead of interpreted `array_intersect` (~50-70µs/call,
    * PERF.md §1). Caller guarantees sorted distinct inputs; unsorted input
    * silently undercounts. */
  case class SortedIntersectCountLong(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_sorted_intersect_count_long"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val nx = x.numElements()
      val ny = y.numElements()
      var i = 0; var j = 0; var c = 0
      while (i < nx && j < ny) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      c
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val ni = ctx.freshName("ni")
        val nj = ctx.freshName("nj")
        val c = ctx.freshName("c")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        s"""
           |int $i = 0, $j = 0, $c = 0;
           |int $ni = $a.numElements(), $nj = $b.numElements();
           |while ($i < $ni && $j < $nj) {
           |  long $xv = $a.getLong($i);
           |  long $yv = $b.getLong($j);
           |  if ($xv == $yv) { $c++; $i++; $j++; }
           |  else if ($xv < $yv) { $i++; } else { $j++; }
           |}
           |${ev.value} = $c;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Distinct byte-trigram codes of a binary column, ascending-sorted, as
    * array<int> (code = b0<<16 | b1<<8 | b2, bytes zero-extended). One
    * tight pass + sort + in-place dedup per row, replacing an interpreted
    * `array_distinct(transform(sequence(...), substr))` pipeline measured
    * at ~3ms/KB. On ASCII text byte-trigrams equal character-trigrams;
    * multi-byte UTF-8 would shingle bytes, not codepoints (fine for
    * dedup fingerprints, different from a char-level oracle).
    * CodegenFallback: evaluated once per document in a narrow map stage,
    * not in a per-pair loop, so interpretation cost is immaterial. */
  case class SortedDistinctTrigramCodes(child: Expression)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
    override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_trigram_codes"

    override protected def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val n = bytes.length - 2
      if (n <= 0) return new GenericArrayData(Array.empty[Int])
      val codes = new Array[Int](n)
      var i = 0
      while (i < n) {
        codes(i) = ((bytes(i) & 0xff) << 16) |
          ((bytes(i + 1) & 0xff) << 8) | (bytes(i + 2) & 0xff)
        i += 1
      }
      java.util.Arrays.sort(codes)
      var w = 1
      i = 1
      while (i < n) {
        if (codes(i) != codes(w - 1)) { codes(w) = codes(i); w += 1 }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(codes, w))
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Distinct FNV-1a-64 hashes of a document's rolling `nWords`-word
    * shingles, ascending-sorted, as array<long>. Splits the UTF-8 bytes
    * on EVERY 0x20 (like `split(text, " ")` — runs of spaces yield empty
    * words), so each shingle's bytes are exactly the original byte range
    * from its first word's start to its last word's end; the hash runs
    * over that range with no string materialization. Fewer than `nWords`
    * words → one shingle spanning the whole text, matching
    * `sequence(0, greatest(n-k, 0))` + `slice` + `concat_ws` semantics.
    * Replaces a ~1ms/doc interpreted HOF pipeline; downstream set ops
    * compare longs instead of 40-byte strings (collision odds for a
    * corpus of ~10^6 shingles: ~1e-7 per corpus, ~1e-14 per doc pair).
    * CodegenFallback: evaluated once per document, not per pair. */
  case class SortedDistinctShingleHashes(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(BinaryType, IntegerType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_shingle_hashes"

    override protected def nullSafeEval(bin: Any, n: Any): Any = {
      val hashes = shingleHashArray(bin.asInstanceOf[Array[Byte]],
        n.asInstanceOf[Int], prettyName)
      java.util.Arrays.sort(hashes)
      var out = 1
      var k = 1
      while (k < hashes.length) {
        if (hashes(k) != hashes(out - 1)) { hashes(out) = hashes(k); out += 1 }
        k += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(hashes, out))
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Positional variant of the shingle hasher: hashes in TEXT ORDER with
    * duplicates kept — one element per shingle window — for span-level
    * consumers (duplicated-span statistics) where position multiplicity
    * is the signal the sorted-set form erases. Same bytes, same FNV-1a-64,
    * so a shingle hashes identically through both forms. */
  case class PositionalShingleHashes(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(BinaryType, IntegerType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_shingle_hashes_pos"

    override protected def nullSafeEval(bin: Any, n: Any): Any =
      new GenericArrayData(shingleHashArray(bin.asInstanceOf[Array[Byte]],
        n.asInstanceOf[Int], prettyName))

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Shared shingle-hash kernel: FNV-1a-64 of each nWords-word window's
    * byte range, one hash per window in text order. Fewer than nWords
    * words → one window spanning the whole text (`sequence` + `slice` +
    * `concat_ws` semantics — see SortedDistinctShingleHashes doc). */
  private def shingleHashArray(bytes: Array[Byte], nWords: Int,
      caller: String): Array[Long] = {
    if (nWords <= 0)
      throw new IllegalArgumentException(
        s"$caller: nWords must be positive, got $nWords")
    // word k spans [starts(k), ends(k))
    var words = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') words += 1; i += 1 }
    val starts = new Array[Int](words)
    val ends = new Array[Int](words)
    var w = 0
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { ends(w) = i; w += 1; starts(w) = i + 1 }
      i += 1
    }
    ends(w) = bytes.length
    val nWin = math.max(words - nWords, 0) + 1
    val hashes = new Array[Long](nWin)
    var k = 0
    while (k < nWin) {
      val from = starts(k)
      val to = ends(math.min(k + nWords - 1, words - 1))
      var h = 0xcbf29ce484222325L // FNV-1a 64 offset basis
      var j = from
      while (j < to) {
        h ^= (bytes(j) & 0xffL)
        h *= 0x100000001b3L
        j += 1
      }
      hashes(k) = h
      k += 1
    }
    hashes
  }

  /** 64-bit SimHash of a document's shingle-hash set (array<long>): per
    * bit, count set-vs-clear across all element hashes; emit the majority
    * bit. One narrow pass per doc — replaces an explode + 64-column
    * conditional aggregate over the whole corpus. */
  case class SimHash64(child: Expression)
      extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(LongType))
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash64"

    override protected def nullSafeEval(input: Any): Any = {
      val hs = input.asInstanceOf[ArrayData]
      val n = hs.numElements()
      val counts = new Array[Int](64)
      var i = 0
      while (i < n) {
        val h = hs.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) {
        if (counts(b) > 0) sig |= (1L << b)
        b += 1
      }
      sig
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** splitmix64 finalizer — the engine's portable hash: pure 64-bit
    * arithmetic (add/xor/shift/multiply mod 2^64), so a DuckDB oracle can
    * replicate it exactly with staged HUGEINT expressions, unlike Spark's
    * murmur3/xxhash64 whose exact outputs are engine-private. Shared by
    * [[MinHashSignature]], [[SplitMix64]], and (via SQL text generated in
    * graft.engine.OracleHash) the correctness oracles. */
  private[graft] def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Scalar splitmix64 over a long column. Used for the RHP-LSH
    * hyperplane signs (Vectors.hyperplaneSign) and the deterministic
    * row-hash paths (q_hash_split / q_sample_stratified / q_rebalance),
    * where it runs once per corpus row inside otherwise codegen'd
    * projections — so it codegens the four-line mix inline (plain long
    * arithmetic) instead of falling back to interpreted eval. */
  case class SplitMix64(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_splitmix64"

    override protected def nullSafeEval(input: Any): Any =
      mix64(input.asInstanceOf[Long])

    override protected def doGenCode(
        ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val z = ctx.freshName("z")
        s"""
           |long $z = $c + 0x9e3779b97f4a7c15L;
           |$z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
           |$z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
           |${ev.value} = $z ^ ($z >>> 31);
         """.stripMargin
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** MinHash signature over a shingle-hash set: permutation i's value is
    * min over elements of splitmix64(h ^ seed_i). One narrow pass per doc
    * (O(elements × perms)) — replaces an explode + numPerms-column min
    * aggregate. The splitmix64 family is portable, so the LSH packs are
    * both recall-checked against exact Jaccard AND oracle-hashed (the
    * DuckDB twin regenerates identical signatures). */
  case class MinHashSignature(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(LongType), IntegerType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash_signature"

    override protected def nullSafeEval(a: Any, p: Any): Any = {
      val hs = a.asInstanceOf[ArrayData]
      val perms = p.asInstanceOf[Int]
      // fail with a clear message instead of a NegativeArraySizeException
      // buried in an executor stack (SortedDistinctShingleHashes already
      // validates its own arg the same way)
      require(perms > 0, s"graft_minhash_signature: perms must be > 0, got $perms")
      val n = hs.numElements()
      // UNSIGNED minimum (init = unsigned max = -1L): the DuckDB oracle
      // takes min over UBIGINT, and a signed min would pick a different
      // shingle as the permutation's minhash whenever the set mixes
      // top-bit-set and small values — breaking the bit-identical
      // signature contract on mid-similarity pairs
      val sig = Array.fill(perms)(-1L)
      var i = 0
      while (i < n) {
        val h = hs.getLong(i)
        var k = 0
        while (k < perms) {
          val v = mix64(h ^ (0x9e3779b97f4a7c15L * (k + 1)))
          if (java.lang.Long.compareUnsigned(v, sig(k)) < 0) sig(k) = v
          k += 1
        }
        i += 1
      }
      new GenericArrayData(sig)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** [[SortedIntersectCount]] with a PER-PAIR abort threshold: returns
    * the exact intersection size when it reaches `need`, and -1 as soon
    * as the remaining elements provably cannot (upper bound = count so
    * far + min(remaining on each side)). For a Jaccard cutoff t the
    * caller passes need = ceil(t/(1+t)·(|a|+|b|)); pairs below the
    * cutoff abort after ~(1-t)/(1+t) of the walk instead of paying the
    * full merge — the dominant case in a dedup candidate stage. */
  case class SortedIntersectCountBounded(first: Expression,
      second: Expression, third: Expression)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
      with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(IntegerType), ArrayType(IntegerType), IntegerType)
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_sorted_intersect_bounded"

    override protected def nullSafeEval(a: Any, b: Any, n: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val need = n.asInstanceOf[Int]
      val nx = x.numElements()
      val ny = y.numElements()
      var i = 0; var j = 0; var c = 0
      while (i < nx && j < ny) {
        if (c + math.min(nx - i, ny - j) < need) return -1
        val xv = x.getInt(i); val yv = y.getInt(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      if (c < need) -1 else c
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b, n) => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val ni = ctx.freshName("ni")
        val nj = ctx.freshName("nj")
        val c = ctx.freshName("c")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        val rem = ctx.freshName("rem")
        s"""
           |int $i = 0, $j = 0, $c = 0;
           |int $ni = $a.numElements(), $nj = $b.numElements();
           |while ($i < $ni && $j < $nj) {
           |  int $rem = ($ni - $i < $nj - $j) ? ($ni - $i) : ($nj - $j);
           |  if ($c + $rem < $n) { $c = -1; break; }
           |  int $xv = $a.getInt($i);
           |  int $yv = $b.getInt($j);
           |  if ($xv == $yv) { $c++; $i++; $j++; }
           |  else if ($xv < $yv) { $i++; } else { $j++; }
           |}
           |${ev.value} = ($c >= 0 && $c < $n) ? -1 : $c;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newFirst: Expression,
        newSecond: Expression, newThird: Expression): Expression =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  /** Long-array sibling of [[SortedIntersectCountBounded]] (the shingle
    * hash sets are sorted longs). Same contract: exact count when it
    * reaches `need`, -1 the moment the upper bound drops below it. */
  case class SortedIntersectCountLongBounded(first: Expression,
      second: Expression, third: Expression)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
      with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(LongType), ArrayType(LongType), IntegerType)
    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_sorted_intersect_long_bounded"

    override protected def nullSafeEval(a: Any, b: Any, n: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val need = n.asInstanceOf[Int]
      val nx = x.numElements()
      val ny = y.numElements()
      var i = 0; var j = 0; var c = 0
      while (i < nx && j < ny) {
        if (c + math.min(nx - i, ny - j) < need) return -1
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      if (c < need) -1 else c
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b, n) => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val ni = ctx.freshName("ni")
        val nj = ctx.freshName("nj")
        val c = ctx.freshName("c")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        val rem = ctx.freshName("rem")
        s"""
           |int $i = 0, $j = 0, $c = 0;
           |int $ni = $a.numElements(), $nj = $b.numElements();
           |while ($i < $ni && $j < $nj) {
           |  int $rem = ($ni - $i < $nj - $j) ? ($ni - $i) : ($nj - $j);
           |  if ($c + $rem < $n) { $c = -1; break; }
           |  long $xv = $a.getLong($i);
           |  long $yv = $b.getLong($j);
           |  if ($xv == $yv) { $c++; $i++; $j++; }
           |  else if ($xv < $yv) { $i++; } else { $j++; }
           |}
           |${ev.value} = ($c >= 0 && $c < $n) ? -1 : $c;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newFirst: Expression,
        newSecond: Expression, newThird: Expression): Expression =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  /** Squared L2 distance between two array<long> columns (fixed-point
    * vector math): Σ(aᵢ-bᵢ)². Integer arithmetic end-to-end, so the
    * result is exact and engine-portable — the distance kernel of the
    * deterministic k-means. Unequal lengths → null (like zip_with). */
  case class SquaredDistLong(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_sqdist_long"

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val a = left.eval(input)
      if (a == null) return null
      val b = right.eval(input)
      if (b == null) return null
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) return null
      var s = 0L
      var i = 0
      while (i < n) {
        val d = x.getLong(i) - y.getLong(i)
        s += d * d
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val dv = ctx.freshName("dv")
        s"""
           |int $n = $a.numElements();
           |if ($b.numElements() != $n) {
           |  ${ev.isNull} = true;
           |} else {
           |  long $s = 0L;
           |  for (int $i = 0; $i < $n; $i++) {
           |    long $dv = $a.getLong($i) - $b.getLong($i);
           |    $s += $dv * $dv;
           |  }
           |  ${ev.value} = $s;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Fixed-width bitmap of a sorted distinct int-code set against the
    * sorted corpus dictionary: bit i (word i >> 6, bit i & 63) is set iff
    * dict(i) ∈ codes. Linear merge of the two ascending arrays. Used by
    * the dense-universe Jaccard join (q_dedup_ngram): a 377-gram corpus
    * universe packs into 6 longs, so the quadratic verify stage streams
    * 48-byte bitmaps instead of ~600-byte code arrays and intersects with
    * AND+popcount instead of a merge walk.
    * CodegenFallback: evaluated once per document, not per pair. */
  case class BitmapFromSortedInts(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(IntegerType), ArrayType(IntegerType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_bitmap_from_sorted"

    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val g = l.asInstanceOf[ArrayData]
      val d = r.asInstanceOf[ArrayData]
      val nd = d.numElements()
      val ng = g.numElements()
      val words = new Array[Long]((nd + 63) >> 6)
      var i = 0
      var j = 0
      while (i < ng && j < nd) {
        val gv = g.getInt(i)
        val dv = d.getInt(j)
        if (gv == dv) { words(j >> 6) |= (1L << (j & 63)); i += 1; j += 1 }
        else if (gv < dv) i += 1
        else j += 1
      }
      new GenericArrayData(words)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** popcount(a AND b) over two equal-length long-array bitmaps — the
    * intersection cardinality of two dictionary bitmaps in a handful of
    * word ops. Codegen'd: this is the per-candidate verify kernel of the
    * banded dense-universe Jaccard join, evaluated millions of times.
    * Unequal lengths → null (inputs must share one dictionary). */
  case class AndPopcount(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_and_popcount"

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val a = left.eval(input)
      if (a == null) return null
      val b = right.eval(input)
      if (b == null) return null
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) return null
      var c = 0
      var i = 0
      while (i < n) {
        c += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
        i += 1
      }
      c
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val c = ctx.freshName("c")
        s"""
           |int $n = $a.numElements();
           |if ($b.numElements() != $n) {
           |  ${ev.isNull} = true;
           |} else {
           |  int $c = 0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $c += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
           |  }
           |  ${ev.value} = $c;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Hand-written table-generating expression (UDTF): splits a document
    * into sentences, emitting one (pos, sentence) row per sentence —
    * SURVEY.md §2.2's UDTF row as a real Catalyst `Generator`, not an
    * `explode` composition. A delimiter is a run of sentence punctuation
    * (`.` `!` `?`) followed by a run of whitespace (space/tab/LF/CR); the
    * delimiter is consumed, empty segments are dropped, and `pos` numbers
    * the KEPT segments 0-based. This is exactly
    * `regexp_split_to_array(text, '[.!?]+[ \t\n\r]+')` + drop-empties in
    * the oracle, but as a single-pass char scan with no regex engine and
    * no intermediate array value — the generator streams rows straight
    * into `GenerateExec`'s row buffer. Scale shape: per-row narrow work,
    * parallelism follows the scan; null text emits no rows (matches
    * `unnest(NULL)`).
    */
  case class SentenceSplit(child: Expression)
      extends UnaryExpression with Generator with CodegenFallback
      with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def prettyName: String = "graft_sentences"
    override def elementSchema: StructType = StructType(Seq(
      StructField("pos", LongType, nullable = false),
      StructField("sentence", StringType, nullable = false)))

    private def isPunct(c: Char): Boolean = c == '.' || c == '!' || c == '?'
    private def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\r'

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
        : IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
      val t = child.eval(input)
      if (t == null) return Nil
      val s = t.asInstanceOf[UTF8String].toString
      val out = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.catalyst.InternalRow]
      var pos = 0L
      var segStart = 0
      var i = 0
      val n = s.length
      def emit(end: Int): Unit = if (end > segStart) {
        out += org.apache.spark.sql.catalyst.InternalRow(
          pos, UTF8String.fromString(s.substring(segStart, end)))
        pos += 1L
      }
      while (i < n) {
        if (isPunct(s.charAt(i))) {
          var j = i + 1
          while (j < n && isPunct(s.charAt(j))) j += 1
          if (j < n && isWs(s.charAt(j))) {
            // delimiter: punct run + ws run; close the segment before it
            emit(i)
            var k = j + 1
            while (k < n && isWs(s.charAt(k))) k += 1
            segStart = k
            i = k
          } else {
            // punct run not followed by ws — no match can start inside
            // the run either (same next char), so skip the whole run
            i = j
          }
        } else {
          i += 1
        }
      }
      emit(n)
      out
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  private def expr(c: Column) = ExpressionUtils.expression(c)

  /** Jaro–Winkler similarity of two UTF-8 byte strings — the scoring
    * kernel for the entity-resolution rows, matched BIT-EXACTLY against
    * DuckDB's `jaro_winkler_similarity` (fuzz-verified on 8k random
    * pairs + the classic record-linkage battery, Round16Spec): byte
    * (not codepoint) comparison, match window `max(l1,l2)/2 - 1`,
    * transpositions = half the mismatched matched positions, Winkler
    * boost p=0.1 over a ≤4-byte common prefix only when jaro > 0.7,
    * and the empty-vs-empty quirk (0.0, not 1.0). Division order is
    * part of the contract — do not refactor the arithmetic. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = matches.toDouble
    var sim = (md / l1 + md / l2 + (matches - t) / md) / 3.0
    if (sim > 0.7) {
      val maxL = math.min(4, math.min(l1, l2))
      var l = 0
      while (l < maxL && s1(l) == s2(l)) l += 1
      sim = sim + l * 0.1 * (1 - sim)
    }
    sim
  }

  /** `graft_jaro_winkler(a, b)` — see [[jaroWinkler]]. Codegen is a
    * single static call, so the score runs inside the blocking join's
    * whole-stage loop. */
  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(StringType, StringType)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_jaro_winkler"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"org.apache.spark.sql.graft.NativeExpressions.jaroWinkler($a, $b)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column API for the native expressions. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductDouble(expr(a), expr(b)))

  def jaroWinklerCol(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinkler(expr(a), expr(b)))

  def sentences(text: Column): Column =
    ExpressionUtils.column(SentenceSplit(expr(text)))

  def sortedIntersectCount(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectCount(expr(a), expr(b)))

  def sortedIntersectCountLong(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectCountLong(expr(a), expr(b)))

  def squaredDistLong(a: Column, b: Column): Column =
    ExpressionUtils.column(SquaredDistLong(expr(a), expr(b)))

  def sortedIntersectCountBounded(a: Column, b: Column,
      need: Column): Column =
    ExpressionUtils.column(
      SortedIntersectCountBounded(expr(a), expr(b), expr(need)))

  def sortedIntersectCountLongBounded(a: Column, b: Column,
      need: Column): Column =
    ExpressionUtils.column(
      SortedIntersectCountLongBounded(expr(a), expr(b), expr(need)))

  def trigramCodes(bin: Column): Column =
    ExpressionUtils.column(SortedDistinctTrigramCodes(expr(bin)))

  def bitmapFromSortedInts(codes: Column, dict: Column): Column =
    ExpressionUtils.column(BitmapFromSortedInts(expr(codes), expr(dict)))

  def andPopcount(a: Column, b: Column): Column =
    ExpressionUtils.column(AndPopcount(expr(a), expr(b)))

  def shingleHashes(bin: Column, nWords: Column): Column =
    ExpressionUtils.column(
      SortedDistinctShingleHashes(expr(bin), expr(nWords)))

  def shingleHashesPos(bin: Column, nWords: Column): Column =
    ExpressionUtils.column(
      PositionalShingleHashes(expr(bin), expr(nWords)))

  def simHash64(hashes: Column): Column =
    ExpressionUtils.column(SimHash64(expr(hashes)))

  def splitmix64(x: Column): Column =
    ExpressionUtils.column(SplitMix64(expr(x)))

  /** JVM-side splitmix64 (the same finalizer the SplitMix64 expression
    * evaluates) — lets callers precompute deterministic constant tables
    * driver-side (e.g. RHP-LSH hyperplane signs) instead of evaluating
    * the interpreted expression per row. */
  def splitmix64Long(x: Long): Long = mix64(x)

  def minHashSignature(hashes: Column, perms: Column): Column =
    ExpressionUtils.column(MinHashSignature(expr(hashes), expr(perms)))

  /** Spark's runtime-filter Bloom machinery, exposed as Columns. The
    * planner uses these internally for `InjectRuntimeFilter`; building
    * them explicitly gives the classic two-phase membership pattern:
    * aggregate a compact Bloom sketch over the small side (a few MB for
    * 10⁸ items at 1% FPR — broadcastable when the exact key set is not),
    * prefilter the big side with the codegen'd `might_contain`, then
    * remove the false positives with an exact join over the survivors
    * only. `c` must be a LongType key (hash strings first). */
  def bloomFilterAgg(c: Column, numItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(expr(c),
          org.apache.spark.sql.catalyst.expressions.Literal(numItems),
          org.apache.spark.sql.catalyst.expressions.Literal(numBits))
        .toAggregateExpression())

  def bloomMightContain(bloom: Column, value: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        expr(bloom), expr(value)))

  /** A 1-row/1-column DataFrame as a scalar-subquery expression.
    * `BloomFilterMightContain` only accepts a constant or scalar
    * subquery as its sketch argument (it must be fixed at execution
    * start), so the aggregated sketch plugs in through this — exactly
    * how `InjectRuntimeFilter` wires its generated filters. */
  def scalarSubquery(df: org.apache.spark.sql.DataFrame): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        df.queryExecution.analyzed))

  /** Spark's banded `Levenshtein` with a PER-PAIR threshold column.
    * `functions.levenshtein` only exposes a literal Int threshold, but
    * the Catalyst expression accepts any int Expression; a per-pair
    * bound (e.g. the similarity cutoff `floor(3*mx/10)`) keeps the DP
    * band as narrow as each pair allows. Returns -1 when the distance
    * provably exceeds the threshold, the exact distance otherwise. */
  def boundedLevenshtein(l: Column, r: Column, thr: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.Levenshtein(
        expr(l), expr(r), Some(expr(thr))))
}
