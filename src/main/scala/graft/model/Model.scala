package graft.model

/** Input row — the `input_hint` contract from BASELINE.json: an
  * Iceberg-shaped table of image + caption pairs. */
final case class ImageRow(
    image_id: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fmt: String,
    caption: String,
    phash: Long
)

/** Per-image signature row — the Spark analog of the reference's LMDB
  * hash/coeff/pixel side-tables (db.rs:678-789, SURVEY.md §1.3). The PDQ
  * hash is carried as 4 longs (h0..h3, little-endian 8-byte words) so
  * Hamming distance is Σ bit_count(xor) in whole-stage codegen, plus the
  * 8 dihedral variant hashes (pdqhash.rs:71-87) for store-1/query-8. */
final case class Signature(
    image_id: String,
    ord: Long,                      // dense id assigned at signature-write
    content_hash: Array[Byte],      // sha-256 of encoded bytes (P1 analog)
    pixel_hash: Array[Byte],        // sha-256 of decoded RGBA (P2), null on decode failure
    h0: Long, h1: Long, h2: Long, h3: Long, // 256-bit PDQ as 4 longs
    quality: Int,                   // PDQ quality ×100, 0-100 (scanner.rs:1416-1418)
    low_conf: Boolean,              // quality < 50 ⇒ exact-match only (scanner.rs:1579-1594)
    variants: Array[Array[Long]],   // 8 dihedral hashes × 4 longs
    phash64: Long,                  // 64-bit DCT pHash (phash.rs)
    phash_variants: Array[Long],    // 8 bitwise dihedral pHashes (phash.rs:242-255)
    minhash: Array[Int],            // caption MinHash signature
    caption: String,
    has_pdq: Boolean,               // false when decode failed or dims < 5px
    fmt: String,                    // input fmt (per-fmt decode metrics)
    decode_status: String,          // ok | too_small | error | unsupported
    // EXIF parsed from the bytes in the SAME kernel pass (decode-once,
    // scanner.rs:107-192 parses EXIF during the main scan) — None/absent
    // when the container has no APP1 block
    orientation: Option[Int],       // tag 0x0112, 1-8
    exif_ts: Option[Long],          // DateTimeOriginal → epoch seconds UTC
    gps_lat: Option[Double],        // DMS rationals → signed decimal
    gps_lon: Option[Double]
)

/** Verified duplicate edge (canonical ord_a < ord_b). */
final case class Edge(a: Long, b: Long, dist: Int)

/** Final group row (SURVEY.md §1.1 GroupInfo / GroupStatus). */
final case class GroupRow(
    group_id: Long,            // component root ord
    image_id: String,
    ord: Long,
    group_size: Int,
    max_dist: Int,
    status: String             // AllIdentical | SomeIdentical | None
)
