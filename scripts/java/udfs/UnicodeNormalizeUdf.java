package udfs;

import com.ibm.icu.text.Normalizer2;
import org.apache.spark.sql.api.java.UDF2;

/**
 * JVM lane for X4 unicode normalization (VERDICT r7 #5): Spark SQL has
 * no ICU normalizer builtin, and the pandas_udf fallback is the
 * engine's only full-corpus Python projection. icu4j ships inside the
 * Spark distribution itself (jars/icu4j-77.1.jar — the collation
 * engine), so normalization can run JVM-side as a registered Java UDF:
 * per-row JVM call, no Arrow/Python round trip.
 *
 * Forms mirror operators/text.unicode_normalize: NFC / NFKC / NFD /
 * NFKD via the shared Normalizer2 singletons (thread-safe per ICU
 * docs). A null form or unknown form fails fast — the Python caller
 * validates first, so an exception here means lane drift.
 */
public class UnicodeNormalizeUdf implements UDF2<String, String, String> {
    private static final Normalizer2 NFC = Normalizer2.getNFCInstance();
    private static final Normalizer2 NFKC = Normalizer2.getNFKCInstance();
    private static final Normalizer2 NFD = Normalizer2.getNFDInstance();
    private static final Normalizer2 NFKD = Normalizer2.getNFKDInstance();

    @Override
    public String call(String text, String form) {
        if (text == null) {
            return null;
        }
        switch (form) {
            case "NFC":
                return NFC.normalize(text);
            case "NFKC":
                return NFKC.normalize(text);
            case "NFD":
                return NFD.normalize(text);
            case "NFKD":
                return NFKD.normalize(text);
            default:
                throw new IllegalArgumentException("unknown form: " + form);
        }
    }
}
