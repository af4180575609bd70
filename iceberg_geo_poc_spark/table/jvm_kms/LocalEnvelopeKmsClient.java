import java.nio.charset.StandardCharsets;
import java.security.SecureRandom;
import java.util.Base64;
import java.util.HashMap;
import java.util.Map;
import javax.crypto.Cipher;
import javax.crypto.spec.GCMParameterSpec;
import javax.crypto.spec.SecretKeySpec;
import org.apache.hadoop.conf.Configuration;
import org.apache.parquet.crypto.KeyAccessDeniedException;
import org.apache.parquet.crypto.keytools.KmsClient;

/**
 * Local-wrap KMS client mirroring the engine's Python _EnvelopeKms:
 * wrapped key = base64( "AGSP" || nonce(12) || AES-GCM(masterKey, key,
 * aad=masterKeyId) || tag(16) ). Master keys arrive preferentially via
 * the key-access token ("id1:base64,id2:base64") so parquet-mr's
 * KeyToolkit caches one client PER KEY SET (the token participates in
 * the cache key; a conf-only transport would let the first table's
 * client serve every later table). Falls back to the Hadoop conf
 * property iceberg.geo.poc.kms.keys for direct-classpath deployments.
 */
public class LocalEnvelopeKmsClient implements KmsClient {
  private final Map<String, byte[]> masters = new HashMap<>();
  private static final byte[] MAGIC = {'A', 'G', 'S', 'P'};
  private static final SecureRandom RNG = new SecureRandom();

  @Override
  public void initialize(Configuration conf, String kmsInstanceID,
      String kmsInstanceURL, String accessToken) {
    String spec = "";
    if (accessToken != null && !accessToken.isEmpty()
        && !"DEFAULT".equals(accessToken)) {
      spec = accessToken;
    } else {
      spec = conf.getTrimmed("iceberg.geo.poc.kms.keys", "");
    }
    for (String kv : spec.split(",")) {
      if (kv.isEmpty()) continue;
      int i = kv.indexOf(':');
      if (i < 0) {
        throw new IllegalArgumentException(
            "malformed key-spec entry (expected id:base64): " + kv);
      }
      masters.put(kv.substring(0, i),
          Base64.getDecoder().decode(kv.substring(i + 1)));
    }
  }

  private Cipher cipher(int mode, byte[] mk, byte[] nonce, byte[] aad)
      throws Exception {
    Cipher c = Cipher.getInstance("AES/GCM/NoPadding");
    c.init(mode, new SecretKeySpec(mk, "AES"), new GCMParameterSpec(128, nonce));
    c.updateAAD(aad);
    return c;
  }

  @Override
  public String wrapKey(byte[] keyBytes, String masterKeyIdentifier)
      throws KeyAccessDeniedException {
    byte[] mk = masters.get(masterKeyIdentifier);
    if (mk == null) throw new KeyAccessDeniedException(masterKeyIdentifier);
    try {
      byte[] nonce = new byte[12];
      RNG.nextBytes(nonce);
      byte[] ct = cipher(Cipher.ENCRYPT_MODE, mk, nonce,
          masterKeyIdentifier.getBytes(StandardCharsets.UTF_8))
          .doFinal(keyBytes);
      byte[] out = new byte[4 + 12 + ct.length];
      System.arraycopy(MAGIC, 0, out, 0, 4);
      System.arraycopy(nonce, 0, out, 4, 12);
      System.arraycopy(ct, 0, out, 16, ct.length);
      return Base64.getEncoder().encodeToString(out);
    } catch (Exception e) {
      throw new KeyAccessDeniedException(e.toString());
    }
  }

  @Override
  public byte[] unwrapKey(String wrappedKey, String masterKeyIdentifier)
      throws KeyAccessDeniedException {
    byte[] mk = masters.get(masterKeyIdentifier);
    if (mk == null) throw new KeyAccessDeniedException(masterKeyIdentifier);
    try {
      byte[] env = Base64.getDecoder().decode(wrappedKey);
      for (int i = 0; i < 4; i++) {
        if (env[i] != MAGIC[i]) throw new IllegalArgumentException("bad magic");
      }
      byte[] nonce = new byte[12];
      System.arraycopy(env, 4, nonce, 0, 12);
      byte[] ct = new byte[env.length - 16];
      System.arraycopy(env, 16, ct, 0, ct.length);
      return cipher(Cipher.DECRYPT_MODE, mk, nonce,
          masterKeyIdentifier.getBytes(StandardCharsets.UTF_8)).doFinal(ct);
    } catch (Exception e) {
      throw new KeyAccessDeniedException(e.toString());
    }
  }
}
