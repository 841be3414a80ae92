package graft.server

/** Environment-driven server configuration — the analog of the reference's
  * boot config (reference: src/config.rs:1-73 `Config::from_env`): each
  * field reads `GRAFT_<FIELD>` from the environment and falls back to the
  * reference's defaults (`data_directory` conventionally under /var/lib,
  * loopback host, port 8824). An unparseable numeric value fails fast at
  * boot (the reference panics — config.rs:66-72 `get_env_cast_or`), never
  * silently falls back: serving on a port the operator didn't ask for is
  * worse than not starting.
  */
final case class GraftConfig(
    dataDirectory: String = "/var/lib/graft/data",
    tcpListenHost: String = "127.0.0.1",
    tcpListenPort: Int = 8824) {
  override def toString: String =
    s"""GRAFT_DATA_DIRECTORY="$dataDirectory"
       |GRAFT_TCP_LISTEN_HOST="$tcpListenHost"
       |GRAFT_TCP_LISTEN_PORT="$tcpListenPort"""".stripMargin
}

object GraftConfig {
  // Locale.ROOT: under a Turkish default locale a bare toUpperCase maps
  // i→İ ("GRAFT_DATA_DİRECTORY"), silently ignoring the operator's env
  private def envify(key: String): String =
    "GRAFT_" + key.toUpperCase(java.util.Locale.ROOT)

  /** Injectable env lookup so the precedence contract is testable without
    * mutating the process environment. */
  def fromEnv(env: String => Option[String] =
      k => sys.env.get(k)): GraftConfig = {
    val d = GraftConfig()
    GraftConfig(
      dataDirectory = env(envify("data_directory")).getOrElse(d.dataDirectory),
      tcpListenHost = env(envify("tcp_listen_host")).getOrElse(d.tcpListenHost),
      tcpListenPort = env(envify("tcp_listen_port")).map { raw =>
        raw.toIntOption.filter(p => p >= 0 && p <= 65535).getOrElse(
          throw new IllegalArgumentException(
            s"$raw is not a valid tcp_listen_port value!"))
      }.getOrElse(d.tcpListenPort))
  }
}
