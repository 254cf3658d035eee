package graft.net

import java.nio.file.{Files, Path, Paths}
import java.security.KeyStore

import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/** TLS material for the network edge — parity with the reference's HTTPS
  * termination (`subsystem/net-hyper/src/tls.rs` builds a rustls
  * ServerConfig from cert+key files; the whole
  * `examples/load-balancer-https/` fronts a pipeline with it, and QUIC is
  * TLS-native in `subsystem/net-quinn/src/lib.rs`). JDK-only: a PKCS12
  * keystore feeds `SSLContext`, which [[HttpIngress]] mounts via
  * `HttpsServer`/`HttpsConfigurator`.
  *
  * Production deployments point [[sslContext]] at their issued keystore;
  * [[selfSignedKeystore]] shells out to the JDK's own `keytool` to mint a
  * throwaway self-signed cert for dev/test rigs (the reference's https
  * example ships exactly such a self-signed pair).
  */
object Tls {

  /** Build a server/client SSLContext from a PKCS12 keystore. The same
    * keystore doubles as the truststore, which is what a self-signed
    * dev/test rig wants; production clients validating a CA-issued chain
    * use their platform trust anchors instead. */
  def sslContext(keystore: Path, password: Array[Char]): SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    val in = Files.newInputStream(keystore)
    try ks.load(in, password) finally in.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, password)
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, tmf.getTrustManagers, null)
    ctx
  }

  /** Mint a fresh self-signed RSA cert (CN=localhost) into
    * `dir/graft-dev.p12` via the JDK's `keytool` — dev/test only. */
  def selfSignedKeystore(dir: Path, password: Array[Char]): Path = {
    val ks = dir.resolve("graft-dev.p12")
    val keytool = Paths.get(System.getProperty("java.home"), "bin", "keytool")
    val cmd = Seq(keytool.toString, "-genkeypair", "-alias", "graft",
      "-keyalg", "RSA", "-keysize", "2048", "-validity", "7",
      "-storetype", "PKCS12", "-keystore", ks.toString,
      // :env sourcing keeps the password out of /proc/<pid>/cmdline,
      // where any local process could read a plain -storepass argument
      "-storepass:env", "GRAFT_KEYSTORE_PW", "-keypass:env", "GRAFT_KEYSTORE_PW",
      "-dname", "CN=localhost",
      // modern clients verify SANs, not CN — without these the JDK's own
      // HttpClient refuses the handshake ("No subject alternative names")
      "-ext", "SAN=dns:localhost,ip:127.0.0.1")
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    pb.environment().put("GRAFT_KEYSTORE_PW", new String(password))
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    require(p.waitFor() == 0, s"keytool failed: $out")
    ks
  }
}
