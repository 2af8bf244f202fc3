package graft

/** One-command reproduction of the round gate — correctness dump, DuckDB
  * oracle compare, bench + soak — with every artifact written under one
  * directory (self-contained; nothing depends on stdout-tail truncation or
  * env-var recipes):
  *
  * {{{
  * sbt "runMain graft.Gate"                 // defaults below
  * sbt "runMain graft.Gate sf0.01dir sf0.1dir outDir"
  * }}}
  *
  * Artifacts: `outDir/verify_out/<query>.parquet` + `oracle_sql.json` (the
  * driver-contract dump), `outDir/correctness.txt` (the per-query DuckDB
  * hash-compare, when python3 + dev/oracle_check.py are present — the
  * oracle runs driver-side, outside this library), `outDir/bench_last.json`
  * (the complete bench line: per-query seconds, samples, soak profiles).
  */
object Gate {
  def main(args: Array[String]): Unit = {
    val sfVerify = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val sfBench = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(2).getOrElse("target/gate")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    new java.io.File(outDir).mkdirs()

    println(s"[gate] 1/3 correctness dump: $sfVerify -> $outDir/verify_out")
    Verify.run(sfVerify, s"$outDir/verify_out", cpus = cpus)

    val oracle = new java.io.File("dev/oracle_check.py")
    if (oracle.isFile) {
      println(s"[gate] 2/3 oracle compare -> $outDir/correctness.txt")
      val pb = new ProcessBuilder("python3", oracle.getPath, sfVerify,
        s"$outDir/verify_out")
      pb.redirectErrorStream(true)
      pb.redirectOutput(new java.io.File(s"$outDir/correctness.txt"))
      val code = pb.start().waitFor()
      val lines = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(s"$outDir/correctness.txt"))
      val tail = if (lines.isEmpty) "" else lines.get(lines.size - 1) // "N/N match"
      println(s"[gate] oracle compare: $tail (exit $code)")
      if (code != 0) System.err.println("[gate] ORACLE COMPARE FAILED")
    } else println("[gate] 2/3 skipped: dev/oracle_check.py not present")

    println(s"[gate] 3/3 bench+soak: $sfBench -> $outDir/bench_last.json")
    Bench.run(sfBench, cpus, soakOnly = false, soakOn = true,
      outPath = s"$outDir/bench_last.json")
  }
}
