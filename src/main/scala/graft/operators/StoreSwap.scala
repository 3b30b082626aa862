package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe publish swap shared by every persisted store family
  * (signature / cluster-map / semantic / LM / HLL / KLL / export
  * manifest). Delete-then-rename has a window where a crash between
  * the delete and the rename loses BOTH generations of the store;
  * the three-step swap (dst → dst.old, tmp → dst, delete dst.old)
  * leaves at least one complete generation on disk at every instant:
  *
  *  - crash before the first rename: old store intact at `dst`;
  *  - crash between the renames: old store intact at `dst.old`
  *    (recoverable by renaming it back — the store's `_SUCCESS` /
  *    completeness gate distinguishes it from a half-written dst);
  *  - crash before the final delete: NEW store live at `dst`, the
  *    stale `dst.old` is swept by the next publish.
  *
  * Each store's completeness gate (`_SUCCESS` markers inside the
  * published directory) is what readers consult, so a leftover
  * `.old` or `.inprogress` directory is never mistaken for the
  * store itself.
  */
object StoreSwap {

  /** Null-safe gate for ensure-path content fingerprints: every
    * ensure* helper fingerprints its input as
    * (count, max(id), bit_xor(hash)) and interpolates the row into a
    * /tmp path — but max()/bit_xor() are NULL on an EMPTY frame, so a
    * bare getLong surfaces as an opaque NullPointerException (the r15
    * ADVICE defect class on the substring helpers, audited repo-wide
    * in r16). Helpers whose empty-input semantics are spec-defined
    * (the substring store) handle the case themselves; every other
    * ensure* routes its fingerprint row through this gate and fails
    * LOUDLY, naming the helper and the cause.
    */
  def requireNonEmptyFp(r: org.apache.spark.sql.Row,
      who: String): org.apache.spark.sql.Row = {
    require(r.getLong(0) > 0L,
      s"$who: empty input frame — content fingerprint undefined " +
        "(max/bit_xor aggregate NULL)")
    // r17 (ADVICE): a NON-empty frame whose key column is all NULL
    // still has max() = NULL — the same opaque-NPE class this gate
    // was built to close. Check every aggregate field, not just the
    // count.
    for (i <- 1 until r.length)
      require(!r.isNullAt(i),
        s"$who: fingerprint aggregate #$i is NULL (all-NULL id/hash " +
          "column?) — content fingerprint undefined")
    r
  }

  /** The ensure* content-fingerprint triple, as a value: row count,
    * max(id), order-free content hash. `tag` is the path segment every
    * build-once store interpolates.
    */
  final case class ContentFp(n: Long, maxId: Long, hash: Long) {
    def tag: String =
      s"${n}_${maxId}_${java.lang.Long.toHexString(hash)}"
  }

  /** ONE copy of the ensure* fingerprint plumbing (extracted r17 after
    * three fingerprint-wide audits; the hash-column SETS stay
    * per-site): `(count, max(idCol), bit_xor(xxhash64(hashCols)))`
    * over the store's input, gated by [[requireNonEmptyFp]] so empty
    * input and all-NULL id/hash columns fail loudly naming the caller.
    * The r13 audit rule is unchanged and now reads off the call site:
    * `hashCols` must name EVERY column the stored artifact derives
    * from, or a same-shape regenerated fixture serves stale artifacts.
    */
  def contentFp(df: org.apache.spark.sql.DataFrame, who: String,
      idCol: String, hashCols: Seq[String]): ContentFp = {
    import org.apache.spark.sql.functions._
    val r = df.agg(count(lit(1)).as("n"), max(col(idCol)).as("mx"),
        expr(s"bit_xor(xxhash64(${hashCols.mkString(", ")}))").as("h"))
      .collect().head
    requireNonEmptyFp(r, who)
    ContentFp(r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Atomically make `tmp` the new content of `dst`. `tmp` must be a
    * fully-written directory (all files + completeness markers). Any
    * stale `.old` from a previous crashed publish is swept first —
    * but if `dst` itself is MISSING while a `.old` survives (a crash
    * landed between the two renames of a previous swap), the old
    * generation is restored first, so the normal swap-out below
    * preserves it as the rollback generation for THIS publish too.
    */
  def swapIn(fs: FileSystem, tmp: Path, dst: Path): Unit = {
    val old = new Path(dst.getParent, dst.getName + ".old")
    recover(fs, dst, fs.exists)
    fs.delete(old, true)
    if (fs.exists(dst))
      require(fs.rename(dst, old), s"swap-out $dst -> $old failed")
    require(fs.rename(tmp, dst), s"rename $tmp -> $dst failed")
    fs.delete(old, true)
  }

  /** Deterministic directory tag for a compaction fold over `tags` —
    * ONE copy of the cross-family contract: prefix `c` (disjoint from
    * content tags' `b`, so a fold can never collide with an ingest
    * batch), arity + 6-byte md5 of the sorted set (a re-run fold
    * overwrites its own dirs; different folded sets never share a
    * tag).
    */
  def compactTag(tags: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    "c" + tags.size + "_" + md.digest(
      tags.sorted.mkString("|").getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
  }

  /** Auto-recovery from a crash between [[swapIn]]'s two renames:
    * if `dst` is incomplete (per the caller's gate — typically "has
    * a `_SUCCESS` marker") while `dst.old` IS complete, rename the
    * old generation back into place. Turns the scaladoc'd manual
    * recovery into code on every read/ensure/publish path that calls
    * it, so a direct-read consumer never fails on a missing store
    * while a complete generation sits in `.old`. Returns true iff a
    * recovery happened. Single-writer discipline assumed (the same
    * assumption every store publish already makes).
    */
  def recover(fs: FileSystem, dst: Path,
      isComplete: Path => Boolean): Boolean = {
    val old = new Path(dst.getParent, dst.getName + ".old")
    if (!isComplete(dst) && fs.exists(old) && isComplete(old)) {
      fs.delete(dst, true)
      require(fs.rename(old, dst), s"recover $old -> $dst failed")
      true
    } else false
  }
}
