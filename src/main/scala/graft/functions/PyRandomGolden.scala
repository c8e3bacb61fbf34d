package graft.functions

/** Golden `random.seed(42); random.sample(range(n), 25)` outputs captured
  * from real CPython 3 (the reference's sampling primitive,
  * analyse_polygons.py first-N/random-N feature selection). Generated
  * once with:
  *
  * {{{
  * python3 - <<'EOF'
  * import random
  * for n in [100, 1500, 15000, 150000]:
  *     random.seed(42)
  *     print(n, random.sample(range(n), 25))
  * EOF
  * }}}
  *
  * These are the independent fixture for BOTH the q38 DuckDB oracle and
  * the [[PyRandom]] unit tests — the engine's MT19937 port is checked
  * against CPython's actual output, never against itself. */
object PyRandomGolden {

  val sample42: Map[Int, Seq[Int]] = Map(
    100 -> Seq(81, 14, 3, 94, 35, 31, 28, 17, 13, 86, 69, 11, 75, 54, 4,
      97, 88, 27, 29, 64, 77, 84, 71, 25, 89),
    1500 -> Seq(1309, 228, 51, 563, 501, 457, 285, 209, 1385, 1116, 178,
      1209, 864, 65, 61, 191, 447, 476, 1034, 1232, 54, 1149, 407, 1466, 1330),
    15000 -> Seq(10476, 1824, 409, 12149, 4506, 4012, 3657, 2286, 12066,
      1679, 11087, 12135, 14617, 8935, 1424, 9674, 6912, 520, 488, 1535,
      3582, 3811, 8279, 9863, 434),
    150000 -> Seq(29184, 6556, 72097, 64196, 58513, 36579, 26868, 142964,
      22790, 110604, 8331, 7811, 24561, 57314, 60990, 132475, 6956, 147127,
      52124, 142853, 109974, 57787, 117757, 72926, 1703))
}
