package graft

/** 5-second host-cleanliness probe: samples Bench's two fixed-work
  * calibration kernels (register-bound CPU, DRAM-streaming memory) and
  * prints their medians against the committed clean-host reference —
  * the cheap go/no-go check before launching a timing-sensitive bench
  * run on this contention-prone shared box (the round-5 sessions
  * measured recurring multi-minute DRAM-contention windows that
  * inflate bandwidth-bound work 4×+ while CPU probes stay flat).
  * Exit code 0 = clean, 1 = contended — scriptable:
  * `until MAIN=graft.HostCheck tools/run_verify.sh; do sleep 60; done`.
  */
object HostCheck {
  def main(args: Array[String]): Unit = {
    // JIT warmup, then 9 samples of each
    Bench.calibrationProbe(); Bench.calibrationProbe()
    Bench.memCalibrationProbe(); Bench.memCalibrationProbe()
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val cpu = med((1 to 9).map(_ => Bench.calibrationProbe()))
    val mem = med((1 to 9).map(_ => Bench.memCalibrationProbe()))
    // same gates as Bench's noise verdict (reference ~48 ms / ~14 ms)
    val clean = cpu <= 60.0 && mem <= 18.0
    println(f"""{"cpu_probe_med_ms":$cpu%.1f,"mem_probe_med_ms":$mem%.1f,"clean":$clean}""")
    sys.exit(if (clean) 0 else 1)
  }
}
