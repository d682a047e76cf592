package graft.pipeline

/** Shared exactly-once ledger-key helpers for the streaming ingest sinks
  * (corpus, ANN, BM25, CDC, link-graph): each sink keeps a per-source
  * committed-epoch property `<family base>.<md5(srcTag)>` on its target
  * database. One definition — five drifting copies of the ledger-key
  * derivation were the riskiest duplication in the exactly-once
  * machinery (a key-derivation change applied to one sink would silently
  * orphan the others' committed epochs).
  *
  * NOT shared: [[DeltaModelIngest]]'s 12-char-truncated digest — it
  * names PHYSICAL delta tables, and widening it would orphan every delta
  * table persisted under the short name (stored-state compatibility).
  */
private[graft] object IngestLedger {

  def digest(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The per-source committed-epoch ledger key. */
  def epochProp(base: String, srcTag: String): String =
    s"$base.${digest(srcTag)}"
}
