package graft

/** Tag for bench-scale (sf0.1) spec tiers. Runs in plain `sbt test`;
  * exclude with `testOnly * -- -l graft.SlowTest` for a quick loop.
  */
object SlowTest extends org.scalatest.Tag("graft.SlowTest")
