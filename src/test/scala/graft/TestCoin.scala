package graft.operators

import org.apache.spark.sql.Column

/** Test-only bridge to the package-private md5-hex6 coin, so specs can
  * assert kernel implementations (CdcBoundaries) replay it exactly. */
object TestCoin {
  def hexInt(keyCol: Column, salt: String): Column = Sampling.hexInt(keyCol, salt)
}
