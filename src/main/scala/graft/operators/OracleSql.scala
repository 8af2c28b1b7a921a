package graft.operators

/** DuckDB SQL fragments shared by oracle twins that re-derive the Scala
  * hash kernels (TextKernels.hash64 / mix64) bit-for-bit. All arithmetic
  * is HUGEINT mod 2⁶⁴ (the q44 precedent): Java's wrapping long ops map
  * to unsigned residues, and splitmix64's two 64×64-bit multiplies are
  * split hi·2³²+lo so every intermediate stays under HUGEINT's 2¹²⁷
  * ceiling — (x·c) mod 2⁶⁴ = ((x·hi mod 2³²)·2³² + x·lo) mod 2⁶⁴.
  */
object OracleSql {

  /** 2⁶⁴ as a HUGEINT literal — the wrapping modulus. */
  val MOD = "CAST(18446744073709551616 AS HUGEINT)"

  /** TextKernels.hash64 of string expression `s`, as an unsigned
    * mod-2⁶⁴ HUGEINT residue. Iterates Unicode codepoints where the
    * Scala kernel iterates UTF-16 code units — equivalent only for BMP
    * text (the corpus is ASCII-ish synthetic; caveat documented at q44).
    */
  def hash64(s: String): String =
    s"""list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT),
       |      list_transform(string_split($s, ''), c -> CAST(unicode(c) AS HUGEINT))),
       |    (a, c) -> (31*a + c) % $MOD)""".stripMargin

  /** CTE chain applying TextKernels.mix64 to column `z` of CTE `src`,
    * carrying the `carry` columns through; terminates in CTE
    * `mixed$sfx` exposing the mixed value as column `m` (unsigned
    * residue). `sfx` disambiguates CTE names when several hash chains
    * compose in one statement (q71 unions three pair miners).
    */
  def mix64Ctes(carry: String, src: String, sfx: String = ""): String =
    s"""m1$sfx AS (SELECT $carry, xor(z, z >> 30) AS x FROM $src),
       |m1b$sfx AS (SELECT $carry,
       |    (((x * 3210233709) % 4294967296) * 4294967296 + (x * 484763065)) % $MOD AS z
       |  FROM m1$sfx),
       |m2$sfx AS (SELECT $carry, xor(z, z >> 27) AS x FROM m1b$sfx),
       |m2b$sfx AS (SELECT $carry,
       |    (((x * 2496678331) % 4294967296) * 4294967296 + (x * 321982955)) % $MOD AS z
       |  FROM m2$sfx),
       |mixed$sfx AS (SELECT $carry, xor(z, z >> 31) AS m FROM m2b$sfx)""".stripMargin

  /** Unsigned residue → signed BIGINT (Java long) via the ±2⁶³ shift. */
  def toSigned(u: String): String =
    s"""CAST(($u + CAST(9223372036854775808 AS HUGEINT)) % $MOD
       |      - CAST(9223372036854775808 AS HUGEINT) AS BIGINT)""".stripMargin

  /** Plain single-space tokenization — the TextAnalysis.toks
    * convention: `split(text, ' ')` keeps empty tokens and splits only
    * on the literal space. DuckDB's `string_split` matches Spark's
    * `split` exactly for this pattern (both keep empties, both yield
    * [''] for the empty string). Every oracle whose engine twin
    * tokenizes via `TextAnalysis.toks` MUST build on this fragment so
    * the two sides can never drift; the trimmed `\s+` kernel
    * convention ([[toksCte]]) is a DIFFERENT tokenization used by the
    * shingle/dedup family (TextKernels.tokenize) — do not mix them
    * within one query.
    */
  val plainSplit = "string_split(text, ' ')"

  /** Whitespace tokenization mirroring TextKernels.tokenize
    * (NULL → empty list), as CTE `toks` with token list `t`.
    */
  def toksCte(table: String, id: String, sfx: String = ""): String =
    s"""toks$sfx AS (
       |  SELECT $id,
       |    list_filter(string_split_regex(trim(coalesce(text, '')), '\\s+'),
       |                x -> x <> '') AS t
       |  FROM $table)""".stripMargin

  /** Distinct word k-shingle set per row (TextKernels.shingles), as CTE
    * `shing$sfx` with list column `sset`; expects `toks$sfx` upstream.
    */
  def shinglesCte(k: Int, id: String, sfx: String = ""): String =
    s"""shing$sfx AS (
       |  SELECT $id,
       |    CASE WHEN len(t) < $k THEN [array_to_string(t, ' ')]
       |         ELSE list_distinct(list_transform(range(1, len(t) - ${k - 2}),
       |                i -> array_to_string(t[i:i+${k - 1}], ' ')))
       |    END AS sset
       |  FROM toks$sfx)""".stripMargin
}
