import java.io.*;
import javax.sound.sampled.*;

/**
 * Real-encoder AUDIO fixture generator: javax.sound.sampled (the JDK's
 * own audio stack, independent of this repo's pure-Python decoders)
 * writes a deterministic PCM16 stereo signal as AIFF and AU, converts it
 * to G.711 mu-law via the JDK's UlawCodec, and dumps the JDK's OWN
 * mu-law->PCM16 decode so the Python tests can anchor the G.711 table
 * against a genuine third-party implementation.
 *
 * Signal formula (recomputed by tests/test_real_anchors.py):
 *   sample[i] = ((i * 2654435761 mod 2^32) >> 16) mod 4096 - 2048
 */
public class AudioFixGen {
    static final int FRAMES = 400, CHANNELS = 2, RATE = 11025;

    static byte[] pcmBE() {
        byte[] pcm = new byte[FRAMES * CHANNELS * 2];
        for (int i = 0; i < FRAMES * CHANNELS; i++) {
            long h = (i * 2654435761L) & 0xFFFFFFFFL;
            int v = (int) ((h >>> 16) % 4096) - 2048;
            pcm[2 * i] = (byte) (v >> 8);
            pcm[2 * i + 1] = (byte) v;
        }
        return pcm;
    }

    static AudioInputStream pcmStream() {
        AudioFormat f16 = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
                RATE, 16, CHANNELS, CHANNELS * 2, RATE, true);
        return new AudioInputStream(new ByteArrayInputStream(pcmBE()), f16, FRAMES);
    }

    public static void main(String[] args) throws Exception {
        File dir = new File(args.length > 0 ? args[0] : ".");

        AudioSystem.write(pcmStream(), AudioFileFormat.Type.AIFF,
                new File(dir, "real_javasound.aiff"));
        AudioSystem.write(pcmStream(), AudioFileFormat.Type.AU,
                new File(dir, "real_javasound.au"));

        // PCM16 -> ULAW via the JDK codec, written as AU
        AudioFormat ulaw = new AudioFormat(AudioFormat.Encoding.ULAW,
                RATE, 8, CHANNELS, CHANNELS, RATE, true);
        AudioInputStream ulawStream = AudioSystem.getAudioInputStream(ulaw, pcmStream());
        ByteArrayOutputStream ub = new ByteArrayOutputStream();
        AudioSystem.write(ulawStream, AudioFileFormat.Type.AU, ub);
        try (FileOutputStream fo = new FileOutputStream(new File(dir, "real_ulaw.au"))) {
            fo.write(ub.toByteArray());
        }

        // the JDK's OWN mu-law -> PCM16 reference decode of that AU
        AudioFormat f16 = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
                RATE, 16, CHANNELS, CHANNELS * 2, RATE, true);
        dumpLinear(ub.toByteArray(), f16, new File(dir, "ulaw_ref.pcm"));

        // same pair for G.711 A-law via the JDK's AlawCodec
        AudioFormat alaw = new AudioFormat(AudioFormat.Encoding.ALAW,
                RATE, 8, CHANNELS, CHANNELS, RATE, true);
        AudioInputStream alawStream = AudioSystem.getAudioInputStream(alaw, pcmStream());
        ByteArrayOutputStream ab = new ByteArrayOutputStream();
        AudioSystem.write(alawStream, AudioFileFormat.Type.AU, ab);
        try (FileOutputStream fo = new FileOutputStream(new File(dir, "real_alaw.au"))) {
            fo.write(ab.toByteArray());
        }
        dumpLinear(ab.toByteArray(), f16, new File(dir, "alaw_ref.pcm"));
        System.out.println("audio fixtures written to " + dir);
    }

    static void dumpLinear(byte[] au, AudioFormat f16, File out) throws Exception {
        AudioInputStream back = AudioSystem.getAudioInputStream(
                new ByteArrayInputStream(au));
        AudioInputStream lin = AudioSystem.getAudioInputStream(f16, back);
        try (FileOutputStream fo = new FileOutputStream(out)) {
            byte[] buf = new byte[4096];
            int n;
            while ((n = lin.read(buf)) > 0) fo.write(buf, 0, n);
        }
    }
}
