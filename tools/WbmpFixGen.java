import java.awt.image.BufferedImage;
import java.io.*;
import javax.imageio.ImageIO;

/**
 * Real-encoder WBMP fixture: javax.imageio's WBMP writer (independent of
 * this repo's decoder) encodes a deterministic 61x23 bitonal pattern.
 * Pattern formula (recomputed by tests/test_real_anchors.py):
 *   pixel(x, y) = 1 (white) iff (x*7 + y*13) % 5 < 2
 */
public class WbmpFixGen {
    public static void main(String[] args) throws Exception {
        File dir = new File(args.length > 0 ? args[0] : ".");
        int w = 61, h = 23;
        BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY);
        for (int y = 0; y < h; y++)
            for (int x = 0; x < w; x++)
                img.setRGB(x, y, ((x * 7 + y * 13) % 5 < 2) ? 0xFFFFFF : 0x000000);
        ImageIO.write(img, "wbmp", new File(dir, "real_imageio.wbmp"));
        System.out.println("wbmp fixture written to " + dir);
    }
}
