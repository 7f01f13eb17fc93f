package graft.util

import java.nio.file.{Files, Path}
import java.security.KeyStore
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/** TLS context construction from file-based credentials (reference PKI
  * util, `core/src/main/scala/atiesh/utils/PKI.scala:20-74`: builds an
  * SSLContext from a custom CA for the syslog TLS transport). Pure JDK —
  * X.509 parsing via `CertificateFactory`, no library dependency. */
object PKI {

  /** Client-side context trusting exactly the CAs in a PEM bundle
    * (one or more concatenated `-----BEGIN CERTIFICATE-----` blocks). */
  def trustContext(caPem: Path): SSLContext = {
    val cf = java.security.cert.CertificateFactory.getInstance("X.509")
    val in = Files.newInputStream(caPem)
    val certs =
      try cf.generateCertificates(in)
      finally in.close()
    require(!certs.isEmpty, s"no certificates in $caPem")
    val ks = KeyStore.getInstance(KeyStore.getDefaultType)
    ks.load(null, null)
    val it = certs.iterator()
    var i = 0
    while (it.hasNext) { ks.setCertificateEntry(s"ca-$i", it.next()); i += 1 }
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }

  /** Server-side context from a PKCS#12 keystore (cert + private key) —
    * used by tests to stand up a local RFC 5425 endpoint, and usable for
    * any component that terminates TLS. */
  def serverContext(p12: Path, password: Array[Char]): SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    val in = Files.newInputStream(p12)
    try ks.load(in, password)
    finally in.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, password)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }
}
